#!/usr/bin/env bash
# ViT-B/16 CIFAR-10 fine-tune — the reference recipe (src/FT_CIFAR10.sh)
# on vitax. Pretrained weights: the ViT npz loads directly (no conversion);
# the reference's .pth also works.
python -m vitax.train_cli \
       --exp-name ft \
       --model-arch b16 \
       --checkpoint-path weights/imagenet21k+imagenet2012_ViT-B_16-224.pth \
       --image-size 224 \
       --batch-size 32 \
       --num-workers 4 \
       --data-dir data/ \
       --dataset CIFAR10 \
       --num-classes 10 \
       --train-steps 15000 \
       --lr 0.03 \
       --wd 0.0 \
       --warmup-steps 500
