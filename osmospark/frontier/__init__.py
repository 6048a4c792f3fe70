"""Distributed frontier scheduler: Bloom URL-seen state, politeness,
DFS-priority admission, round loop + record assembly."""

from .engine import FrontierEngine, assemble_records

__all__ = ["FrontierEngine", "assemble_records"]
