#!/usr/bin/env bash
# Evaluation recipe (src/eval.sh). --checkpoint-path accepts a vitax
# checkpoint dir, a .npz, or a reference .pth.
python -m vitax.eval_cli \
       --model-arch b16 \
       --checkpoint-path experiments/save/<exp>/checkpoints/best \
       --image-size 224 \
       --batch-size 32 \
       --num-workers 4 \
       --data-dir data/ \
       --dataset CIFAR10
