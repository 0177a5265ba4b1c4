"""Scene front-end: loaders, builder, SoA types."""
from .types import SceneData, SceneMeta, FilmMeta  # noqa: F401
from .builder import build_scene  # noqa: F401
