from .affine import (GeoParams, affine_matrices, apply_flips, apply_gamma,
                     apply_geometric, identity_geo_params, sample_geo_params,
                     transform_image, transform_logits)
from .intensity import color_jitter, gaussian_noise, random_cutout

__all__ = ["GeoParams", "affine_matrices", "apply_flips", "apply_gamma",
           "apply_geometric", "identity_geo_params", "sample_geo_params",
           "transform_image", "transform_logits", "color_jitter", "gaussian_noise",
           "random_cutout"]
