#!/bin/sh
# Build the --py-files artifact for spark-submit deployment.
set -e
cd "$(dirname "$0")/.."
rm -f dist/tilematrix_spark.zip
mkdir -p dist
zip -qr dist/tilematrix_spark.zip tilematrix_spark -x '*__pycache__*'
echo "dist/tilematrix_spark.zip"
