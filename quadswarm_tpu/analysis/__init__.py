from quadswarm_tpu.analysis.plots import (  # noqa: F401
    extract_scalars, fps_compare, mean_std_plot,
)
