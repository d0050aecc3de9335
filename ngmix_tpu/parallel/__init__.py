from . import distributed  # noqa: F401
from .mesh import (  # noqa: F401
    make_mesh,
    make_sharded_mb_pipeline_fn,
    make_sharded_pipeline_fn,
    sharded_shear_response,
)
