#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
# Usage: scripts/build_pyfiles.sh  ->  dist/log_server_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/log_server_spark.zip
zip -qr dist/log_server_spark.zip log_server_spark -x '*__pycache__*'
echo "dist/log_server_spark.zip"
