#!/bin/sh
# Canonical 3D LUNA pretraining config (reference run3d.sh / README.md:127).
python main.py --data "${LUNA_DATA:-./processed_luna}" --b 32 --epochs 240 --lr 1e-3 \
  --output "${OUTPUT:-./out3d}" --n luna --d 3 --gpus 0,1,2,3 --ratio 1.0 --amp "$@"
