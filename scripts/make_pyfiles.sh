#!/usr/bin/env bash
# Build dist/pyconform_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pyconform_spark.zip
zip -qr dist/pyconform_spark.zip pyconform_spark -x '*__pycache__*'
echo "dist/pyconform_spark.zip:"
unzip -l dist/pyconform_spark.zip | tail -2
