#!/usr/bin/env bash
# ViT-B/16 CIFAR-100 fine-tune (src/FT_CIFAR100.sh) — the north-star
# benchmark workload (BASELINE.md).
# add --fused-qkv for the fused attention kernel (bench config, +18%)
python -m vitax.train_cli \
       --exp-name ft \
       --model-arch b16 \
       --checkpoint-path weights/imagenet21k+imagenet2012_ViT-B_16-224.pth \
       --image-size 224 \
       --batch-size 32 \
       --num-workers 4 \
       --data-dir data/ \
       --dataset CIFAR100 \
       --num-classes 100 \
       --train-steps 15000 \
       --lr 0.03 \
       --wd 0.0 \
       --warmup-steps 500
