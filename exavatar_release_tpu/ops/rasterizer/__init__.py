from .api import RasterizeSettings, rasterize
from .preprocess import project_gaussians, ScreenGaussians
