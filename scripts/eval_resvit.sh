#!/usr/bin/env bash
# Res-ViT evaluation — a real entry point (the reference README claims
# res-vit/eval.py, which does not exist; its eval.sh calls src/eval.py).
python -m vitax.resvit_eval_cli \
       --model-arch b16 \
       --checkpoint-path experiments/save/<exp>/checkpoints/best \
       --image-size 224 \
       --batch-size 32 \
       --data-dir data/ \
       --dataset CIFAR100 \
       --block_size 4 \
       --lora_rank 48 \
       --dynamic_start_layer 1 \
       --dynamic_reserve_initials 2
