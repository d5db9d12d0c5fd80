from vosesam_tpu.ops.image import (  # noqa: F401
    im_normalize,
    im_denormalize,
    pad_divide_by,
    unpad,
    resize_bilinear,
    resize_mask_prompt,
)
from vosesam_tpu.ops.aggregate import soft_aggregate  # noqa: F401
