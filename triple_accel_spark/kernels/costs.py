"""Edit-cost model.

Semantics match the reference's ``EditCosts`` struct
(/root/reference/src/levenshtein.rs:21-89): positive mismatch and gap
costs, an optional affine gap-start cost, and an optional restricted
(adjacent, OSA) transposition cost that must be cheaper than emulating
the transposition with other edits.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EditCosts:
    """Costs for edit operations in distance / search kernels.

    Attributes
    ----------
    mismatch_cost : int  (> 0)
    gap_cost : int       (> 0)
    start_gap_cost : int (>= 0; extra cost to open a gap — affine gaps)
    transpose_cost : int | None  (adjacent-transposition cost; ``None``
        disables transpositions; must satisfy ``cost // 2 < mismatch``
        and ``cost // 2 < gap`` — reference levenshtein.rs:44-52)
    """

    mismatch_cost: int = 1
    gap_cost: int = 1
    start_gap_cost: int = 0
    transpose_cost: int | None = None

    def __post_init__(self) -> None:
        if self.mismatch_cost <= 0:
            raise ValueError("mismatch_cost must be positive")
        if self.gap_cost <= 0:
            raise ValueError("gap_cost must be positive")
        if self.start_gap_cost < 0:
            raise ValueError("start_gap_cost must be non-negative")
        if self.transpose_cost is not None:
            t = self.transpose_cost
            if t <= 0:
                raise ValueError("transpose_cost must be positive")
            if (t >> 1) >= self.mismatch_cost or (t >> 1) >= self.gap_cost:
                raise ValueError(
                    "transpose_cost must be cheaper than the equivalent "
                    "mismatch/gap edits (reference levenshtein.rs:49-51)"
                )

    @property
    def allow_transpose(self) -> bool:
        return self.transpose_cost is not None

    def check_search(self) -> None:
        """Search constraint: transpositions must not be beatable by the
        free prefix gap (reference levenshtein.rs:67-71)."""
        if self.transpose_cost is not None:
            if self.transpose_cost > self.start_gap_cost + self.gap_cost:
                raise ValueError(
                    "for search, transpose_cost must be <= "
                    "start_gap_cost + gap_cost"
                )

    @property
    def is_unit(self) -> bool:
        """True for plain Levenshtein (the Myers bit-parallel fast path)."""
        return (
            self.mismatch_cost == 1
            and self.gap_cost == 1
            and self.start_gap_cost == 0
            and self.transpose_cost is None
        )


LEVENSHTEIN_COSTS = EditCosts(1, 1, 0, None)
RDAMERAU_COSTS = EditCosts(1, 1, 0, 1)
