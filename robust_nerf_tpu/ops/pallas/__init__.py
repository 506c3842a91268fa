"""Compatibility shim — the Pallas kernels moved to
robust_nerf_tpu.experimental.pallas (round 4: demoted from the production
namespace after plain XLA won every production-surface A/B; see
robust_nerf_tpu/experimental/__init__.py and DESIGN.md). This shim keeps
`robust_nerf_tpu.ops.pallas[.fused_mlp|.resample]` imports working.
"""

from __future__ import annotations

import sys

from ...experimental.pallas import fused_mlp, resample  # noqa: F401
from ...experimental.pallas import pallas_enabled  # noqa: F401

sys.modules[__name__ + ".fused_mlp"] = fused_mlp
sys.modules[__name__ + ".resample"] = resample
