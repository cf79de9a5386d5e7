#!/usr/bin/env bash
# Residual-ViT fine-tune — the reference's res-vit/ft_resvit.sh is broken as
# written (mid-command blank lines terminate the invocation; several flags it
# names do not exist in its parser — SURVEY §2.2 Recipes). This is the
# working recipe with the hyperparameters that script documents:
# lora_rank 48, active_target 0.4, start_layer 1, reserve 2, block_size 4,
# lambda_active 10, lambda_distill 1.
python -m vitax.resvit_train_cli \
       --exp-name reslr \
       --model-arch b16 \
       --checkpoint-path weights/imagenet21k+imagenet2012_ViT-B_16-224.pth \
       --image-size 224 \
       --batch-size 32 \
       --num-workers 4 \
       --data-dir data/ \
       --dataset CIFAR100 \
       --train-steps 15000 \
       --warmup-steps 500 \
       --lr 1e-4 \
       --wd 0.05 \
       --lr-scheduler cosine_with_warmup \
       --use_lora True \
       --use_reslr True \
       --lora_rank 48 \
       --dynamic_active_target 0.4 \
       --dynamic_start_layer 1 \
       --dynamic_reserve_initials 2 \
       --block_size 4 \
       --initial-lambda-active 10 \
       --initial-lambda-distill 1 \
       --save-routing-viz
