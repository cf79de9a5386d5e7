from vitax.ops.common import default_use_pallas  # noqa: F401
from vitax.ops.layernorm import layer_norm  # noqa: F401
from vitax.ops.attention import multi_head_attention  # noqa: F401
from vitax.ops.mlp import mlp_block  # noqa: F401
from vitax.ops.patchify import patchify_matmul  # noqa: F401
