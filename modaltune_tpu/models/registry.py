"""Aggregator registry: name -> model class.

Replaces the reference's decorator registry/factory
(``models/aggregators/aggregators.py:6-41``) with a plain dict keyed by
the same public names (``longnetvit_gene_adapter``,
``longnetvit_gene_clinical_adapter``, ``titan_gene_adapter``, ...).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

AGGREGATORS: Dict[str, Any] = {}


def register_aggregator(name: str) -> Callable:
    def deco(cls):
        AGGREGATORS[name] = cls
        return cls
    return deco


def create_aggregator(name: str, **kwargs):
    if name not in AGGREGATORS:
        raise ValueError(
            f"Unknown aggregator '{name}'. Available: "
            f"{sorted(AGGREGATORS)}")
    return AGGREGATORS[name](**kwargs)
