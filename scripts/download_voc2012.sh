#!/usr/bin/env bash
# Download + extract PASCAL VOC2012 trainval into ./data/VOCdevkit
# (equivalent of reference data/scripts/VOC2012.sh).
set -euo pipefail
ROOT="${1:-data}"
mkdir -p "$ROOT"
cd "$ROOT"
curl -LO "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar"
tar -xf VOCtrainval_11-May-2012.tar
rm -f VOCtrainval_11-May-2012.tar
echo "VOC2012 ready under $ROOT/VOCdevkit"
