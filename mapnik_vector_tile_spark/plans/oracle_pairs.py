"""Oracle-pair registry facade.

The former 17k-line monolith now lives in plans/oracle_parts/p1..p5
(an order-preserving split: importing the parts in sequence executes
exactly the statements the monolith executed, including every
_ENGINE_PAIRS registration).  This module preserves the import
surface: ``from ...oracle_pairs import X`` keeps working for every
top-level name via PEP 562 module __getattr__ over the parts."""

from mapnik_vector_tile_spark.plans.oracle_parts import p1 as _p1
from mapnik_vector_tile_spark.plans.oracle_parts import p2 as _p2
from mapnik_vector_tile_spark.plans.oracle_parts import p3 as _p3
from mapnik_vector_tile_spark.plans.oracle_parts import p4 as _p4
from mapnik_vector_tile_spark.plans.oracle_parts import p5 as _p5

_MODS = (_p5, _p4, _p3, _p2, _p1)


def __getattr__(name):
    for _m in _MODS:
        if hasattr(_m, name):
            return getattr(_m, name)
    raise AttributeError(
        f"module 'oracle_pairs' has no attribute {name!r}"
    )


def __dir__():
    out = set()
    for _m in _MODS:
        out.update(vars(_m))
    return sorted(out)
