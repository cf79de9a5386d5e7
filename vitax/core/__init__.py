from vitax.core.config import (  # noqa: F401
    ViTConfig,
    ResViTConfig,
    ARCH_PRESETS,
    DATASET_NUM_CLASSES,
    arch_config,
    resvit_arch_config,
    num_classes_for_dataset,
)
