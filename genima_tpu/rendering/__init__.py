from genima_tpu.rendering.spheres import (  # noqa: F401
    JOINT_COLOR_MAP,
    SPHERE_BASE_FACTORS,
    STRIPE_COLORS,
    render_spheres,
    sphere_params_for_timestep,
)
from genima_tpu.rendering.compositor import (  # noqa: F401
    composite_rgb_rendered,
    composite_rnd_bg,
)
