"""Model layer: capacity-padded Gaussian parameter pytrees, temporal
deformation, and the learnable environment map."""

from .gaussians import (  # noqa: F401
    GaussianConfig, GaussianParams, GaussianState, GaussianModel,
    create_from_pcd, deformed_package,
)
from .env_map import EnvironmentMap  # noqa: F401
