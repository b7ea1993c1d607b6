from . import pe, raygen, ray_march, camera, sh, geometry, grid, query  # noqa: F401
