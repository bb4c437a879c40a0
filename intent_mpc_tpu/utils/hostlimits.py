"""Host kernel-limit management for XLA:CPU's per-kernel JIT mappings.

Root cause of the "cumulative XLA:CPU segfault" (benchmark/xla_cpu_probe.py,
confirmed by instrumenting the full one-process suite): every compiled
XLA:CPU executable holds ~3 memory mappings PER FUSED KERNEL (LLVM ORC JIT
section triples r--/r-x/rw-), kept alive by jax's executable caches. An
engine-class program compiles to ~620 kernels => ~1,830 mappings, so one
process accumulating a few dozen engine programs crosses Linux's default
vm.max_map_count (65,530). The next mmap fails and the compiler aborts
("Fatal Python error: Aborted" inside backend_compile_and_load — exactly
the historical crash sites). Neither program COUNT nor code SIZE is the
resource; the MAP COUNT is.

Two remedies, used together by tests/conftest.py:
  * ensure_map_headroom(): raise vm.max_map_count when privileged (this
    image runs as root; the write is a reversible kernel tunable, the
    standard remedy — cf. Elasticsearch's bootstrap requirement).
  * map_budget_remaining(): live headroom check so an UNPRIVILEGED run
    can stop a pytest session cleanly before the ceiling and let
    tests/run_suite.sh resume it in a fresh process.
"""

from __future__ import annotations

MAP_COUNT_PATH = "/proc/sys/vm/max_map_count"
TARGET = 1_048_576          # ~570 engine-class programs of headroom
# One engine-class program adds ~1,830 maps (measured); stop a session
# while there is still room to compile one more large program + slack.
GUARD_MARGIN = 4_000


def max_map_count() -> int:
    try:
        with open(MAP_COUNT_PATH) as f:
            return int(f.read())
    except OSError:
        return 65_530      # Linux default; macOS/other: no such limit


def current_map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def ensure_map_headroom(target: int = TARGET) -> dict:
    """Raise vm.max_map_count to `target` if possible. Returns a status
    dict {limit, raised, writable} for logging."""
    limit = max_map_count()
    if limit >= target:
        return {"limit": limit, "raised": False, "writable": True}
    try:
        with open(MAP_COUNT_PATH, "w") as f:
            f.write(str(target))
        return {"limit": max_map_count(), "raised": True, "writable": True}
    except OSError:
        return {"limit": limit, "raised": False, "writable": False}


def map_budget_remaining() -> int:
    """Mappings left before this process hits the kernel ceiling."""
    return max_map_count() - current_map_count()
