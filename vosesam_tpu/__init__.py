"""vosesam_tpu — TPU-native (JAX/XLA/Pallas) video object segmentation framework.

A ground-up rebuild of the capabilities of VOS-E-SAM (vanishing-mask refinement
in semi-supervised VOS): the XMem space-time-memory tracker, SAM / SAM-HQ
promptable segmentation, the on-device prompt-generation + refinement loop,
the DAVIS/LongDataset/LVOS evaluation harness, and the E2FGVI inpainter —
designed TPU-first: pure functions over explicit state pytrees, static shapes,
bf16 on the MXU, Pallas kernels for the memory-read attention, and
sequence-data-parallel evaluation over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from vosesam_tpu.config import (  # noqa: F401
    FrameworkConfig,
    MemoryConfig,
    RefinementConfig,
    SAMConfig,
    XMemConfig,
)
