"""Shared guard for iterative fixpoint plans.

Every pointer-jumping / frontier-propagation operator in this package
runs a bounded round loop; silently returning an unconverged state when
the budget is exhausted would be a WRONG answer with no signal (e.g. a
least-cost path longer than max_rounds cells). Loops call
ensure_converged from their for/else clause so exhaustion raises.
"""

from __future__ import annotations


class ConvergenceError(RuntimeError):
    """An iterative plan exhausted its round budget while still changing."""


def ensure_converged(changed: int, what: str, rounds: int) -> None:
    """Raise if a round budget ran out with work still pending.

    changed: rows still changing (or frontier size) after the last round;
    0 means the caller broke out normally and this is a no-op.
    """
    if changed:
        raise ConvergenceError(
            f"{what} did not converge within {rounds} rounds "
            f"({changed} rows still changing); raise max_rounds — "
            f"a partial fixpoint is not a valid result"
        )
