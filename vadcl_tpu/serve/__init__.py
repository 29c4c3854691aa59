"""Serving: export the scorer as a self-contained StableHLO artifact.

The reference has no deployment story — its eval scripts rebuild the model
from Python source and a .pth file every run.  This subsystem serializes the
jitted window scorer (weights baked in as constants) via ``jax.export`` so a
serving process can score video windows with NO model code, NO checkpoint
translation, and NO Python-side config — just JAX and the artifact.
"""

from vadcl_tpu.serve.export import (
    ServingArtifact,
    artifact_window_runner,
    export_window_scorer,
    load_artifact,
    save_artifact,
)

__all__ = [
    "ServingArtifact",
    "artifact_window_runner",
    "export_window_scorer",
    "load_artifact",
    "save_artifact",
]
