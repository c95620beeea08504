"""BC6H block-compressed HDR texture decode (stub).

The reference accepts any GPU-supported DDS format via
DDSTextureLoader12 (reference: Source/GPUTexture.cpp:165-245),
including BC6H-compressed HDR cubemaps. Full table-driven BC6H mode
decode is planned; until then this raises with guidance.
"""

import numpy as np


def decode_bc6h(raw, w, h, signed=False):
    raise NotImplementedError(
        "BC6H-compressed DDS decode is not implemented yet; re-export "
        "the environment map as uncompressed float DDS "
        "(R16G16B16A16_FLOAT / R32G32B32A32_FLOAT), .hdr, or .exr.")
