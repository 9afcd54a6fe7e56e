from g4splat_tpu.core.transforms import (
    quat_to_rotmat,
    rotmat_to_quat,
    normalize,
)
from g4splat_tpu.core.cameras import Camera, make_camera
from g4splat_tpu.core import sh
