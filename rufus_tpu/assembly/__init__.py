"""Greedy overlap assembly (OverlapSam / Overlap / OverlapRegion family)."""
