from vitax.checkpointing.npz import load_npz_params, save_npz_params  # noqa: F401
from vitax.checkpointing.convert import (  # noqa: F401
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)
