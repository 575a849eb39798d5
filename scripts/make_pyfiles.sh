#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kg.zip
zip -qr dist/kg.zip uk_ner_presidio_demo_spark -x '*__pycache__*'
echo "dist/kg.zip"
