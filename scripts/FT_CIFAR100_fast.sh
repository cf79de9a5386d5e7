#!/usr/bin/env bash
# ViT-B/16 CIFAR-100 fine-tune — the FAST recipe (the bench primary,
# PERF.md round 4): the full int8 fused-kernel stack + the PatchDropout
# keep-0.5 schedule (train on a random half of the patch tokens for the
# first 90% of epochs at the large batch, full-sequence at b192 for the
# final 10%; eval is always full-sequence). Measured ~2440 img/s/chip (image-fraction amortized) on
# TPU v5e = 1.85x the dense recipe, with no accuracy cost at recipe scale
# on the synthetic harness (PERF.md "token-drop schedule" section;
# arXiv:2208.07220, arXiv:2212.00794).
python -m vitax.train_cli \
       --exp-name ft-fast \
       --model-arch b16 \
       --checkpoint-path weights/imagenet21k+imagenet2012_ViT-B_16-224.pth \
       --image-size 224 \
       --batch-size 768 \
       --dense-batch-size 192 \
       --num-workers 4 \
       --data-dir data/ \
       --dataset CIFAR100 \
       --num-classes 100 \
       --train-steps 15000 \
       --lr 0.03 \
       --wd 0.0 \
       --warmup-steps 500 \
       --int8-dw \
       --token-keep 0.5 \
       --token-keep-schedule 0.9
