"""Process-0 logging guard (the reference's ConditionalOStream pcout;
ref: include/NavierStokes2D.hpp:154).  Under SPMD every process runs the
same program; only process 0 should emit user-facing logs."""

from __future__ import annotations


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def pcout(*args, **kwargs) -> None:
    if is_main_process():
        print(*args, **kwargs)
