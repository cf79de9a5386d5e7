from vitax.utils.metrics import MetricTracker  # noqa: F401
from vitax.utils.writers import ExperimentWriter  # noqa: F401
from vitax.utils.experiment import (  # noqa: F401
    ensure_dir,
    write_json,
    read_json,
    experiment_name,
    process_config,
    config_to_dict,
)
from vitax.utils.memory import (  # noqa: F401
    tree_bytes,
    device_memory_stats,
    print_memory_usage,
    optimize_memory_usage,
    log_model_layers,
)
from vitax.utils.profiling import StepTimer, annotate, trace  # noqa: F401
