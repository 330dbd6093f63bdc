from .fk import make_fk, make_link_frames_fn, joint_frame  # noqa: F401
from .approx import (  # noqa: F401
    make_linearizer,
    make_jacobian,
    apply_deltas,
    apply_deltas_single,
)
