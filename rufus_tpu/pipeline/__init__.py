"""End-to-end pipeline orchestration (runRufus.sh equivalent)."""

from .config import RufusConfig  # noqa: F401
from .driver import RufusPipeline  # noqa: F401
