#!/usr/bin/env bash
# Residual-ViT fine-tune — the FAST routed recipe (PERF.md round 4):
# token compaction (capacity 0.625 = the recipe's ~0.5 active rate +
# slack, the measured convergence-safest setting) + PatchDropout token
# dropping, on the full int8 fused-kernel stack. Measured 2026 img/s on
# TPU v5e = 2.2x the dense routed recipe; convergence recovers to dense
# parity on the synthetic harness (capacity slack mitigates the
# transient router-shift spikes — PERF.md). NOTE: do NOT add the --int4
# tiers here; they measured divergent for routed training.
python -m vitax.resvit_train_cli \
       --exp-name reslr-fast \
       --checkpoint-path weights/imagenet21k+imagenet2012_ViT-B_16-224.pth \
       --dataset CIFAR100 \
       --batch-size 192 \
       --train-steps 15000 \
       --warmup-steps 500 \
       --lr 1.5e-4 \
       --use_lora True --lora_rank 48 \
       --use_reslr True --block_size 4 \
       --dynamic_start_layer 1 --dynamic_reserve_initials 2 \
       --dynamic_active_target 0.4 \
       --int8-dw \
       --compact-capacity 0.625 --compact-warmup 500 \
       --token-keep 0.5
