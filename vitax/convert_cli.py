"""Checkpoint converter CLI — parity with the reference's converter entry
point (src/checkpoint.py:118 `__main__` → save_jax_to_pytorch): turns a ViT
`.npz` into a torch-layout `.pth` the reference can `torch.load`, and the
reverse (`.pth` → `.npz`), all without importing torch.

Run: `python -m vitax.convert_cli --npz w.npz --out w.pth`
     `python -m vitax.convert_cli --pth w.pth --out w.npz --num-layers 12`
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("vitax checkpoint converter")
    p.add_argument("--npz", type=str, default=None, help="input .npz")
    p.add_argument("--pth", type=str, default=None, help="input .pth")
    p.add_argument("--out", type=str, required=True, help="output path")
    p.add_argument("--num-layers", type=int, default=None,
                   help="encoder depth (inferred from npz keys when omitted)")
    a = p.parse_args(argv)

    if (a.npz is None) == (a.pth is None):
        raise SystemExit("provide exactly one of --npz / --pth")

    if a.npz:
        from vitax.checkpointing import save_jax_to_pytorch
        save_jax_to_pytorch(a.npz, a.out, num_layers=a.num_layers)
        print(f"wrote torch-layout checkpoint: {a.out}")
    else:
        import numpy as np

        from vitax.checkpointing import (load_state_dict_pth,
                                         params_from_torch_state_dict,
                                         params_to_flat_npz)
        sd = load_state_dict_pth(a.pth)
        if a.num_layers is None:
            a.num_layers = 1 + max(
                int(k.split(".")[2]) for k in sd
                if k.startswith("transformer.encoder_layers."))
        params = params_from_torch_state_dict(
            {k: np.asarray(v) for k, v in sd.items()}, a.num_layers)
        np.savez(a.out, **params_to_flat_npz(params))
        print(f"wrote npz checkpoint: {a.out}")


if __name__ == "__main__":
    main()
