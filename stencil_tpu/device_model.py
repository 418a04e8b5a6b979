"""Per-device resource model: VMEM capacity and derived kernel budgets.

Round-3 verdict: every VMEM budget/limit in the kernels was a v5e-pinned
literal (tiled 52/48MB, rma 40/48MB, autotune slide 96MB, slab 24/32MB)
even though the autotuner exists precisely for other TPU generations.
This module is the single source those numbers now come from: it looks
up the ATTACHED device's kind, maps it to a VMEM capacity, and scales
every budget proportionally.

Bit-exactness contract: when VMEM = 128MiB — the measured v5e value,
and the fallback for CPU/interpret runs so that plans built in tests
match plans built on silicon — every derived budget reproduces the
round-2/3 bisected literal EXACTLY, and no scoped-limit cap is applied
(the limit VALUE changes Mosaic's schedule; see CLAUDE.md). Only on a
device whose VMEM differs do the numbers move, proportionally, plus a
hard cap of (VMEM - 4MiB) on scoped limits.

The env override ``STENCIL_TPU_VMEM_MB`` simulates other capacities
(tests prove plans built under 16/32/64/128MB budgets stay feasible and
correct; it also un-wedges a mis-detected device in the field).

Analog: the reference treats the CPE's 64KB LDM as the one scarce
resource constant (`/root/reference/src/stencil/slave/stencil_dma.cpp`
LDM buffer sizing); here the scarce constant is VMEM, and it varies by
TPU generation.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

MIB = 1024 * 1024

# The reference capacity all historical budgets were bisected against.
V5E_VMEM = 128 * MIB

# VMEM per TensorCore by device-kind substring (first match wins,
# matched lowercase). v2/v3 cores carry 16MiB of VMEM; v4 and later
# (v4, v5p, v5 lite, v6 lite) carry 128MiB. Unknown kinds — including
# the CPU backend used for tests/interpret — fall back to the v5e value
# so default plans are identical on and off silicon.
VMEM_BY_KIND = (
    ("v2", 16 * MIB),
    ("v3", 16 * MIB),
)


def _detected_vmem() -> int:
    try:
        import jax

        kind = str(getattr(jax.devices()[0], "device_kind", "")).lower()
    except Exception:
        return V5E_VMEM
    for sub, cap in VMEM_BY_KIND:
        if sub in kind:
            return cap
    return V5E_VMEM


@functools.lru_cache(maxsize=1)
def _detected_vmem_cached() -> int:
    return _detected_vmem()


def vmem_bytes() -> int:
    """VMEM capacity of the attached device (env override first)."""
    env = os.environ.get("STENCIL_TPU_VMEM_MB")
    if env:
        return int(env) * MIB
    return _detected_vmem_cached()


@dataclasses.dataclass(frozen=True)
class Budgets:
    """Derived per-kernel VMEM budgets. At vmem=128MiB these equal the
    historical v5e literals bit-for-bit; elsewhere they scale
    proportionally and ``limit_cap`` bounds scoped limits below the
    physical capacity."""

    vmem: int
    slab_budget: int        # ops.pallas explicit-buffer budget (24MiB @128)
    slab_limit_floor: int   # ops.pallas scoped-limit floor     (32MiB @128)
    tiled_budget: int       # ops.pallas_tiled buffer budget    (52MiB @128)
    tiled_limit_floor: int  # ops.pallas_tiled scoped floor     (48MiB @128)
    rma_block_budget: int   # parallel.rma residency budget     (40MiB @128)
    rma_limit: int          # parallel.rma scoped limit         (48MiB @128)
    slide_budget: int       # autotune slide-candidate ceiling  (96MiB @128)
    limit_cap: Optional[int]  # None on the 128MiB reference capacity


# Device (HBM) memory per chip by device-kind substring, used by the
# out-of-core streaming method to auto-size host chunks. First match
# wins, matched lowercase. Values are the public per-chip figures; the
# runtime's own report (memory_stats) wins when available.
HBM_BY_KIND = (
    ("v2", 8 << 30),
    ("v3", 16 << 30),
    ("v4", 32 << 30),
    ("v5p", 95 << 30),
    ("v5 lite", 16 << 30),
    ("v5e", 16 << 30),
    ("v6 lite", 32 << 30),
    ("v6e", 32 << 30),
)


@functools.lru_cache(maxsize=1)
def _detected_hbm_cached() -> int:
    try:
        import jax

        dev = jax.devices()[0]
        try:
            stats = dev.memory_stats()
            limit = int(stats.get("bytes_limit", 0))
            if limit > 0:
                return limit
        except Exception:
            pass
        kind = str(getattr(dev, "device_kind", "")).lower()
    except Exception:
        return 16 << 30
    for sub, cap in HBM_BY_KIND:
        if sub in kind:
            return cap
    return 16 << 30


def hbm_bytes() -> int:
    """Device (HBM) memory of the attached chip: the runtime's reported
    ``bytes_limit`` when available, else a per-kind table, else the v5e
    16GiB (env override ``STENCIL_TPU_HBM_MB`` first — also what lets
    CPU tests simulate a small device to exercise auto-chunking)."""
    env = os.environ.get("STENCIL_TPU_HBM_MB")
    if env:
        return int(env) * MIB
    return _detected_hbm_cached()


def budgets(vmem: Optional[int] = None) -> Budgets:
    v = vmem_bytes() if vmem is None else vmem

    def scale(mib_at_v5e: int) -> int:
        return mib_at_v5e * MIB * v // V5E_VMEM

    return Budgets(
        vmem=v,
        slab_budget=scale(24),
        slab_limit_floor=scale(32),
        tiled_budget=scale(52),
        tiled_limit_floor=scale(48),
        rma_block_budget=scale(40),
        rma_limit=scale(48),
        slide_budget=scale(96),
        # v5e compiles scoped limits up to ~123-124MiB on the 128MiB
        # chip (64x96+slide at 123MiB, CLAUDE.md); cap other capacities
        # at the same 4MiB headroom. No cap at exactly 128MiB: clamping
        # could change a bisected limit VALUE and with it Mosaic's
        # schedule.
        limit_cap=None if v == V5E_VMEM else max(v - 4 * MIB, v * 3 // 4),
    )


def cap_limit(limit: int, b: Optional[Budgets] = None) -> int:
    """Clamp a computed scoped-VMEM limit to the device's cap (identity
    on the 128MiB reference capacity)."""
    b = budgets() if b is None else b
    return limit if b.limit_cap is None else min(limit, b.limit_cap)
