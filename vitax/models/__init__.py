from vitax.models import resvit  # noqa: F401
from vitax.models import resvit_compact  # noqa: F401
from vitax.models import vit  # noqa: F401
