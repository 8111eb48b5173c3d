#!/usr/bin/env bash
# Download + extract PASCAL VOC2007 (trainval + test) into ./data/VOCdevkit
# (equivalent of reference data/scripts/VOC2007.sh).
set -euo pipefail
ROOT="${1:-data}"
mkdir -p "$ROOT"
cd "$ROOT"
base="http://host.robots.ox.ac.uk/pascal/VOC/voc2007"
for f in VOCtrainval_06-Nov-2007.tar VOCtest_06-Nov-2007.tar; do
  echo "downloading $f ..."
  curl -LO "$base/$f"
  tar -xf "$f"
  rm -f "$f"
done
echo "VOC2007 ready under $ROOT/VOCdevkit"
