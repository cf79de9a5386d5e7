#!/usr/bin/env bash
# npz → torch-layout .pth converter (src/checkpoint.py __main__ parity).
python -m vitax.convert_cli --npz weights/ViT-B_16.npz --out weights/ViT-B_16.pth
