"""Token-drop SCHEDULE convergence at the 15k-step recipe scale.

Accuracy defense for promoting the PatchDropout/FLIP keep-0.5 schedule to
the bench primary (VERDICT r4 #1a): train ViT-B/16 @224 for the full
15,000-step FT_CIFAR100.sh recipe length on the synthetic class task
(zero-egress environment), comparing

  dense     — int8-dw stack, full sequence every step (the old primary)
  sched     — keep 0.5 for the first 90% of steps, then full-sequence for
              the final 10% (the PatchDropout fine-tune recipe: dropped
              training + short dense tail; arXiv:2208.07220 §4.4,
              arXiv:2212.00794 FLIP unmasked tuning)
  drop      — keep 0.5 the whole run (no dense tail), for the ablation

Held-out eval is ALWAYS full-sequence. Run ON the TPU:
  python scripts/tokdrop_schedule_convergence.py [dense sched drop]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from vitax.core.cache import enable_compilation_cache
from vitax.core.config import arch_config
from vitax.models import vit
from vitax.train import (create_train_state, make_train_step, onecycle_lr,
                         onecycle_momentum, sgd_momentum)

enable_compilation_cache()

STEPS = int(os.environ.get("TDC_STEPS", "15000"))
BATCH = int(os.environ.get("TDC_BATCH", "128"))
# per-phase batches (the bench recipe runs drop b768 / dense b192 — FLIP's
# masked-phase batch scaling); default = BATCH for both
DROP_BATCH = int(os.environ.get("TDC_DROP_BATCH", "0")) or BATCH
DENSE_BATCH = int(os.environ.get("TDC_DENSE_BATCH", "0")) or BATCH
DENSE_TAIL = 0.1          # final fraction trained full-sequence in `sched`

INT8 = dict(int8_mlp=True, int8_attn=True, int8_mlp_grad=True,
            int8_attn_grad=True, int8_dw=True)


def run(tag):
    keep = 1.0 if tag == "dense" else 0.5
    cfg = arch_config("b16", image_size=224, num_classes=10,
                      dtype=jnp.bfloat16, remat=False, use_pallas=False,
                      fused_qkv=True, fused_mlp=True, token_keep=keep,
                      **INT8)
    cfg_dense = cfg.replace(token_keep=1.0)
    switch = STEPS - int(DENSE_TAIL * STEPS) if tag == "sched" else STEPS

    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    tx = sgd_momentum(onecycle_lr(0.01, STEPS, pct_start=0.033),
                      momentum_schedule=onecycle_momentum(STEPS,
                                                          pct_start=0.033))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step_a = make_train_step(cfg, tx, donate=True)
    step_b = (make_train_step(cfg_dense, tx, donate=True)
              if switch < STEPS else None)

    key = jax.random.PRNGKey(42)
    protos = jax.random.normal(key, (10, 224, 224, 3), jnp.bfloat16)
    def make_batches(bs):
        out = []
        for i in range(8):
            kb = jax.random.fold_in(key, i + 1)
            lab = jax.random.randint(kb, (bs,), 0, 10)
            noise = jax.random.normal(jax.random.fold_in(kb, 7),
                                      (bs, 224, 224, 3), jnp.bfloat16)
            out.append((0.25 * protos[lab] + noise, lab))
        return out
    drop_bs = DROP_BATCH if keep < 1.0 else BATCH
    batches = make_batches(drop_bs)
    dense_batches = (make_batches(DENSE_BATCH) if switch < STEPS
                     and DENSE_BATCH != drop_bs else batches)
    ke = jax.random.fold_in(key, 999)
    elab = jax.random.randint(ke, (BATCH,), 0, 10)
    eimg = 0.25 * protos[elab] + jax.random.normal(
        jax.random.fold_in(ke, 7), (BATCH, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def eval_acc(p):
        logits = vit.apply(p, eimg, cfg_dense, train=False)
        return jnp.mean((jnp.argmax(logits, -1) == elab).astype(jnp.float32))

    t0 = time.time()
    marks = sorted(set([499, 1499, 4999, 9999, switch - 1, switch + 499,
                        STEPS - 1500, STEPS - 500, STEPS - 1]))
    report = []
    for s in range(STEPS):
        img, lab = (batches if s < switch else dense_batches)[s % 8]
        step = step_a if s < switch else step_b or step_a
        state, metrics = step(state, img, lab)
        if s in marks and 0 <= s < STEPS:
            row = (s, float(metrics["loss"]), float(eval_acc(state.params)))
            report.append(row)
            print(f"{tag} step {row[0]:6d}: loss {row[1]:.4f} "
                  f"held-out acc1 {row[2]:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
    print(f"{tag}: DONE in {time.time()-t0:.0f}s; final loss "
          f"{report[-1][1]:.4f} acc {report[-1][2]:.4f}", flush=True)
    return report


tags = sys.argv[1:] or ["dense", "sched"]
results = {tag: run(tag) for tag in tags}
if len(results) > 1:
    base = tags[0]
    for tag in tags[1:]:
        fa = results[tag][-1][2] - results[base][-1][2]
        fl = results[tag][-1][1] - results[base][-1][1]
        print(f"{tag} vs {base}: final acc diff {fa:+.4f}, "
              f"final loss diff {fl:+.4f}", flush=True)
