from . import rotations, sh, camera, geometry
