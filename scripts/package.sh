#!/usr/bin/env bash
# Build dist/coa_ocr_simple_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/coa_ocr_simple_spark.zip
zip -qr dist/coa_ocr_simple_spark.zip coa_ocr_simple_spark \
    -x '*__pycache__*'
echo "dist/coa_ocr_simple_spark.zip"
echo "usage: spark-submit --py-files dist/coa_ocr_simple_spark.zip \\"
echo "         -m coa_ocr_simple_spark.jobs.extract --input db.documents ..."
