#!/bin/sh
# Canonical 2D chest X-ray pretraining config (reference run2d.sh / README.md:78).
python main.py --data "${CHEST_DATA:-./chest_xray}" --b 64 --epochs 240 --lr 1e-2 \
  --output "${OUTPUT:-./out2d}" --n chest --d 2 --gpus 0,1,2,3 --ratio 0.8 --amp "$@"
