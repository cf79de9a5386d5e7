"""vitax — a TPU-native Vision Transformer framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of the
PyTorch reference `sea-with-sakura/ViT-of-Pytorch`:

* ``vitax.models.vit``     — standard Vision Transformer (reference ``src/model.py``)
* ``vitax.models.resvit``  — Residual ViT with dynamic token routing, LoRA and
  distillation (reference ``res-vit/model.py``)
* ``vitax.ops``            — Pallas TPU kernels with pure-XLA fallbacks
* ``vitax.data``           — host input pipeline (CIFAR10/100, ImageNet,
  TinyImageNet) with on-device preprocessing
* ``vitax.checkpointing``  — orbax-native checkpoints plus ``.npz``/``.pth``
  interop with the reference's formats (reference ``src/checkpoint.py``)
* ``vitax.train``          — jit train/eval steps, exact optimizer/schedule
  replicas (SGD+OneCycleLR, AdamW+warmup-cosine)
* ``vitax.parallel``       — ``jax.sharding.Mesh`` based data parallelism
  (supersedes the reference's ``torch.nn.DataParallel``)
"""

__version__ = "0.1.0"

from vitax import checkpointing  # noqa: F401,E402
from vitax import data  # noqa: F401,E402
from vitax import models  # noqa: F401,E402
from vitax import ops  # noqa: F401,E402
from vitax import parallel  # noqa: F401,E402
from vitax import train  # noqa: F401,E402
from vitax import utils  # noqa: F401,E402
from vitax.core.config import (  # noqa: F401,E402
    ARCH_PRESETS,
    DATASET_NUM_CLASSES,
    ResViTConfig,
    ViTConfig,
    arch_config,
    num_classes_for_dataset,
    resvit_arch_config,
)
