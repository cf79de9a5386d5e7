from vitax.models import vit  # noqa: F401
