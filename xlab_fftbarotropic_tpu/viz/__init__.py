from .plots import cmap_vorticity, draw_run, draw_step  # noqa: F401
