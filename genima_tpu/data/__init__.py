from genima_tpu.data.tiling import (  # noqa: F401
    tile_images,
    untile_images,
    resize_half,
)
