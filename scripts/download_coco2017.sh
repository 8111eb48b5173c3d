#!/usr/bin/env bash
# Download + extract COCO2017 (train/val images + annotations) into ./data/COCO
# (equivalent of reference data/scripts/COCO2017.sh).
set -euo pipefail
ROOT="${1:-data/COCO}"
mkdir -p "$ROOT"
cd "$ROOT"
for f in train2017.zip val2017.zip; do
  curl -LO "http://images.cocodataset.org/zips/$f"
  unzip -q "$f" && rm -f "$f"
done
curl -LO "http://images.cocodataset.org/annotations/annotations_trainval2017.zip"
unzip -q annotations_trainval2017.zip && rm -f annotations_trainval2017.zip
echo "COCO2017 ready under $ROOT"
