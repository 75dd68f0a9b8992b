"""Freshness-backlog regression guard (round-8 verdict task #7).

The driver value-checks the first 50 ``queries()`` gates per round
(the window = the head of ``tools/gate_order.json``). Rounds 3-5
accumulated a 90-row backlog of gates whose last driver check fell
many rounds behind; rounds 8-9 drained it. This test makes the drain
an INVARIANT rather than a one-off cleanup: every gate that would be
more than ``MAX_STALE_ROUNDS`` rounds stale at the NEXT driver round
— plus every never-checked gate — must sit inside the upcoming
window. Forward-looking on purpose: it goes red the moment the
checked-in order would let a gate silently age past the bound, not a
round later when it already has.

No Spark session; pure artifact reading, so it runs in milliseconds
and can't flake.
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # rows the driver checks per round (observed r01-r08)
MAX_STALE_ROUNDS = 4


def _last_checked() -> tuple[dict[str, int], int]:
    """gate -> max round with a driver check, and the latest round."""
    last: dict[str, int] = {}
    latest = 0
    for fn in sorted(os.listdir(REPO)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(os.path.join(REPO, fn)) as fh:
            for gate in json.load(fh):
                last[gate] = max(last.get(gate, 0), rnd)
    return last, latest


def test_no_gate_escapes_the_window_beyond_staleness_bound():
    order = json.load(
        open(os.path.join(REPO, "tools", "gate_order.json"))
    )["order"]
    last, latest = _last_checked()
    next_round = latest + 1
    window = set(order[:WINDOW])
    must_drain = [
        g
        for g in order
        if g not in last  # never driver-checked
        or next_round - last[g] > MAX_STALE_ROUNDS
    ]
    escaped = [g for g in must_drain if g not in window]
    assert not escaped, (
        f"{len(escaped)} gate(s) would exceed {MAX_STALE_ROUNDS} rounds "
        f"of driver-check staleness at round {next_round} yet sit "
        f"outside the upcoming {WINDOW}-row window — regenerate "
        f"tools/gate_order.json (python tools/gate_deps.py --write) "
        f"or stop adding gates faster than the window drains: "
        f"{escaped[:10]}"
    )
    # capacity alarm: more must-drain gates than one window can hold
    # means the backlog can no longer clear in a single round no
    # matter the ordering
    assert len(must_drain) <= WINDOW, (
        f"{len(must_drain)} gates need a check at round {next_round} "
        f"but the window holds {WINDOW}"
    )
