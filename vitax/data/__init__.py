from vitax.data.pipeline import (  # noqa: F401
    Batch,
    DataLoader,
    CIFAR10DataLoader,
    CIFAR100DataLoader,
    ImageNetDataLoader,
    TinyImageNetDataLoader,
    SyntheticDataLoader,
    DATALOADER_REGISTRY,
    get_dataloader,
    normalize,
)
from vitax.data.device_prep import (  # noqa: F401
    normalize_device,
    preprocess,
    random_hflip,
)
