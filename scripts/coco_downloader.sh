#!/usr/bin/env bash
# COCO 2017 keypoint dataset fetch + layout
# (equivalent of reference data/cocoDownloader.sh: downloads train/val/test
# images and keypoint annotations, renames into the
#   data/coco/images/{train,val,test}
#   data/coco/annotations_{train,val}.json
# layout the dataset/eval code expects).
set -euo pipefail

DATA_DIR="${1:-./data/coco}"
mkdir -p "${DATA_DIR}/images"
cd "${DATA_DIR}"

fetch() {
  local url="$1"
  local out="$2"
  if [ ! -f "${out}" ]; then
    echo ">> downloading ${url}"
    wget -q --show-progress -O "${out}" "${url}"
  fi
}

fetch http://images.cocodataset.org/zips/train2017.zip train2017.zip
fetch http://images.cocodataset.org/zips/val2017.zip val2017.zip
fetch http://images.cocodataset.org/zips/test2017.zip test2017.zip
fetch http://images.cocodataset.org/annotations/annotations_trainval2017.zip \
  annotations_trainval2017.zip

for z in train2017 val2017 test2017; do
  unzip -q -n "${z}.zip"
done
unzip -q -n annotations_trainval2017.zip

mv -n train2017 images/train
mv -n val2017 images/val
mv -n test2017 images/test
cp -n annotations/person_keypoints_train2017.json annotations_train.json
cp -n annotations/person_keypoints_val2017.json annotations_val.json

echo ">> done: $(ls images) + annotations_{train,val}.json"
