"""Freshness-backlog regression guard (round-8 task #7, round-10 task #2).

The driver value-checks the first 50 ``queries()`` gates per round
(the window = the head of ``tools/gate_order.json``). Rounds 3-5
accumulated a 90-row backlog of gates whose last driver check fell
many rounds behind; rounds 8-10 drained it. This test makes the drain
an INVARIANT rather than a one-off cleanup: every gate that would be
more than ``MAX_STALE_ROUNDS`` rounds stale at the round AFTER the
order was generated — plus every never-checked gate — must sit inside
the upcoming window.

Handoff consistency (round-10 verdict task #2): the driver lands
``CORRECTNESS_r{N}.json`` AFTER the round's final commit, so at every
round handoff the on-disk artifacts are one driver round ahead of the
committed ``gate_order.json``. The r09 version of this test recomputed
staleness from ALL artifacts and went red at exactly that moment. Now
``gate_deps.py --write`` stamps ``as_of_round`` (the newest
CORRECTNESS round visible at generation time) into the order file and
this test evaluates the invariant AS-OF that round: one post-commit
driver landing is expected and tolerated, two without a regen is the
real "builder forgot the round-opening ritual" failure and stays red.
``test_simulated_driver_landing`` pins the tolerated case explicitly.

No Spark session; pure artifact reading, so it runs in milliseconds
and can't flake.
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # rows the driver checks per round (observed r01-r09)
MAX_STALE_ROUNDS = 4


def _correctness_rounds() -> dict[int, list[str]]:
    """round -> gates the driver checked that round."""
    out: dict[int, list[str]] = {}
    for fn in sorted(os.listdir(REPO)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fn)
        if not m:
            continue
        with open(os.path.join(REPO, fn)) as fh:
            out[int(m.group(1))] = list(json.load(fh))
    return out


def _last_checked(
    rounds: dict[int, list[str]], as_of: int
) -> dict[str, int]:
    """gate -> max round <= as_of with a driver check."""
    last: dict[str, int] = {}
    for rnd, gates in rounds.items():
        if rnd > as_of:
            continue
        for gate in gates:
            last[gate] = max(last.get(gate, 0), rnd)
    return last


def _violations(
    order: list[str], last: dict[str, int], as_of: int
) -> tuple[list[str], list[str]]:
    """(escaped, must_drain) for the invariant evaluated as-of a round:
    gates never checked or > MAX_STALE_ROUNDS stale at round as_of+1
    must sit inside the upcoming WINDOW-row head of the order."""
    next_round = as_of + 1
    window = set(order[:WINDOW])
    must_drain = [
        g
        for g in order
        if g not in last or next_round - last[g] > MAX_STALE_ROUNDS
    ]
    return [g for g in must_drain if g not in window], must_drain


def _load_order() -> tuple[list[str], int, int]:
    doc = json.load(open(os.path.join(REPO, "tools", "gate_order.json")))
    rounds = _correctness_rounds()
    latest = max(rounds, default=0)
    as_of = doc.get("as_of_round", latest)
    return doc["order"], as_of, latest


def test_order_predates_at_most_one_driver_landing():
    """The round-opening ritual is `python tools/gate_deps.py --write`.

    Exactly one CORRECTNESS landing after generation is the normal
    handoff state (driver commits after the builder's final commit);
    two means a round opened without regenerating the order, and every
    staleness number the other tests compute is stale itself."""
    _, as_of, latest = _load_order()
    assert latest - as_of <= 1, (
        f"gate_order.json was generated as-of driver round {as_of} but "
        f"CORRECTNESS_r{latest:02d}.json exists — two or more driver "
        f"rounds landed without `python tools/gate_deps.py --write`"
    )


def test_no_gate_escapes_the_window_beyond_staleness_bound():
    order, as_of, _ = _load_order()
    last = _last_checked(_correctness_rounds(), as_of)
    escaped, must_drain = _violations(order, last, as_of)
    assert not escaped, (
        f"{len(escaped)} gate(s) would exceed {MAX_STALE_ROUNDS} rounds "
        f"of driver-check staleness at round {as_of + 1} yet sit "
        f"outside the upcoming {WINDOW}-row window — regenerate "
        f"tools/gate_order.json (python tools/gate_deps.py --write) "
        f"or stop adding gates faster than the window drains: "
        f"{escaped[:10]}"
    )
    # capacity alarm: more must-drain gates than one window can hold
    # means the backlog can no longer clear in a single round no
    # matter the ordering
    assert len(must_drain) <= WINDOW, (
        f"{len(must_drain)} gates need a check at round {as_of + 1} "
        f"but the window holds {WINDOW}"
    )


def test_simulated_driver_landing():
    """The handoff case itself, as a fixture: pretend the driver just
    landed CORRECTNESS_r{as_of+1}.json covering exactly the head-50
    window of the committed order (its documented behavior), and
    assert both guards above would still pass without a regen. This is
    the state every round N+1 builder finds on disk at round open."""
    order, as_of, latest = _load_order()
    rounds = _correctness_rounds()
    simulated = as_of + 1
    rounds = {**rounds, simulated: order[:WINDOW]}
    sim_latest = max(latest, simulated)
    # guard 1: tolerance — the order predates exactly one landing
    assert sim_latest - as_of <= 1
    # guard 2: the as-of invariant is unchanged by the landing (it
    # only reads rounds <= as_of), so the committed order stays valid
    last = _last_checked(rounds, as_of)
    escaped, must_drain = _violations(order, last, as_of)
    assert not escaped and len(must_drain) <= WINDOW
    # and the landing actually drained what the order promised: after
    # the simulated round, nothing outside the NEW first window is
    # older than the bound at round as_of+2 *among gates the order
    # knows about* (new gates added next round re-enter via regen)
    last_after = _last_checked(rounds, simulated)
    stale_after = [
        g
        for g in order
        if g not in last_after
        or simulated + 1 - last_after[g] > MAX_STALE_ROUNDS
    ]
    assert len(stale_after) <= WINDOW, (
        f"even a perfect driver pass over the committed window leaves "
        f"{len(stale_after)} gates past the staleness bound — the "
        f"backlog mathematically cannot drain: {stale_after[:10]}"
    )
