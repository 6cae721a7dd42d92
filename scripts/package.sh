#!/usr/bin/env bash
# Build the --py-files artifact for cluster deployment (north-rule:
# "deploys via spark-submit --py-files on multi-executor clusters").
#
#   ./scripts/package.sh                 # -> dist/jsonschema_go_spark.zip
#   spark-submit --py-files dist/jsonschema_go_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       --conf spark.sql.adaptive.skewJoin.enabled=true \
#       jsonschema_go_spark/runner.py --input s3://bucket/transcripts --run-id r1 ...
#
# (python -m jsonschema_go_spark.runner works too once the zip is on
#  PYTHONPATH of driver+executors.)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/jsonschema_go_spark.zip
zip -qr dist/jsonschema_go_spark.zip jsonschema_go_spark -x "*.pyc" -x "*__pycache__*"
unzip -l dist/jsonschema_go_spark.zip | tail -2
