from vitax.checkpointing.npz import (  # noqa: F401
    flat_npz_to_params,
    params_to_flat_npz,
    load_npz_params,
    save_npz_params,
)
from vitax.checkpointing.convert import (  # noqa: F401
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)
from vitax.checkpointing.pth import (  # noqa: F401
    load_pth,
    save_pth,
    save_pth_tar,
    load_state_dict_pth,
)
from vitax.checkpointing.loader import (  # noqa: F401
    load_checkpoint,
    save_jax_to_pytorch,
    export_pth,
)
from vitax.checkpointing.store import CheckpointStore  # noqa: F401
