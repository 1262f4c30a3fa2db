"""Training-data pipeline queries beyond dedup/text basics — the
operations a large-scale corpus job runs between "clean documents" and
"tensors on disk".

Formerly a single 5.6k-line module; split along its own section seams
(VERDICT r14 "What's wrong" #1) into:

- ``corpus`` — shard packing, curriculum, per-source caps, profiling
- ``contamination`` — exact + fuzzy benchmark screens, detect/apply
- ``maintenance`` — versioned-sink / refresh / compaction audits
- ``packing`` — context windows, length batching, padding costs
- ``mixture`` — KL, temperature, DoReMi, water-filling, resampling
- ``manifest`` — fingerprints, recipe manifest, gated-ingest audits
- ``batches`` — the end-to-end corpus→batches composition + audit
- ``dsir`` — importance resampling, model store, selection→packing
- ``classifiers`` — learned quality/language gates + serving audits
- ``observability`` — topic balance, vocab growth/overlap

Importing this package imports every submodule (query registration is
an import side effect, same as before), and ``__getattr__``/``__dir__``
re-export every submodule name — public and module-private alike — so
existing call sites (``from ...plans.pipeline import X``, including
the tests' ``_oracle`` helpers) keep working verbatim.
"""

from __future__ import annotations

# Original single-file order: registration order within each theme is
# preserved; only the theme interleaving changed (harmless — the driver
# window is fixed by registry._DRIVER_PRIORITY, not insertion order).
from data_warehouse_product_mix_clustering_spark.plans.pipeline import (  # noqa: F401
    batches,
    classifiers,
    contamination,
    corpus,
    dsir,
    maintenance,
    manifest,
    mixture,
    observability,
    packing,
)

_SUBMODULES = (
    corpus,
    contamination,
    maintenance,
    packing,
    mixture,
    manifest,
    batches,
    dsir,
    classifiers,
    observability,
)


def __getattr__(name: str):
    for _m in _SUBMODULES:
        try:
            return getattr(_m, name)
        except AttributeError:
            continue
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list[str]:
    names = set(globals())
    for _m in _SUBMODULES:
        names.update(n for n in dir(_m) if not n.startswith("__"))
    return sorted(names)
