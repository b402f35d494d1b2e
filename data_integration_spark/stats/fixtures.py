"""Survey-shaped fixture generator (FIXTURES.md family B).

Deterministic (seed 42) synthetic analogues of the reference's three inputs
(``Method_code.Rmd:41-42``): a small survey with outcome (PEW-shaped), a big
survey without outcome (CPS-shaped), and per-area ground truth. Generated
from a KNOWN (β, σ) so parameter recovery is assertable — the reference
README's intended validation ("can be used on simulated datasets",
``README.md:12``).

Deliberate deviation from the reference encoded here: the per-area random
effect v_i is drawn ONCE per area with distinct values (the reference's
seed-inside-loop bug makes all areas draw identical noise, ``Rmd:569-571``;
SURVEY.md §5.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BETA_TRUE = np.array([-0.2, 0.3, 0.4, 1.5, 0.8, 0.25, 0.35, 0.9])
SIGMA_TRUE = 0.4

AGE4 = ["18-29", "30-44", "45-64", "65+"]
GENDER = ["female", "male"]
RACE3 = ["black", "hispanic", "white"]
EDUC4 = ["HS or less", "some col", "col grad", "postgrad"]

N_STATES = 51


def _expit(z):
    return 1.0 / (1.0 + np.exp(-z))


def make_fixtures(
    seed: int = 42,
    n_states: int = N_STATES,
    n_absent: int = 2,
    small_per_state: tuple[int, int] = (20, 90),
    big_per_state: tuple[int, int] = (200, 700),
    beta: np.ndarray = BETA_TRUE,
    sigma: float = SIGMA_TRUE,
) -> dict:
    """Returns dict with pandas frames ``survey_small``, ``survey_big``,
    ``actual_result`` and the ``truth`` record (beta, sigma, v by state)."""
    rng = np.random.default_rng(seed)
    states = [f"S{i:02d}" for i in range(n_states)]
    absent = set(rng.choice(states, size=n_absent, replace=False))
    obama12 = {s: rng.uniform(0.25, 0.90) for s in states}
    v_state = {s: rng.normal(0.0, sigma) for s in states}

    def draw_units(state: str, n: int, weight_mu: float, weight_sd: float):
        df = pd.DataFrame(
            {
                "state": state,
                "age4": rng.choice(AGE4, size=n),
                "gender": rng.choice(GENDER, size=n),
                "race3": rng.choice(RACE3, size=n, p=[0.15, 0.2, 0.65]),
                "educ4": rng.choice(EDUC4, size=n),
                "obama12": obama12[state],
                "weight": rng.lognormal(weight_mu, weight_sd, size=n),
            }
        )
        x = np.column_stack(
            [
                (df["age4"] == "45-64").astype(float),
                (df["gender"] == "female").astype(float),
                (df["race3"] == "black").astype(float),
                (df["race3"] == "hispanic").astype(float),
                (df["educ4"] == "col grad").astype(float),
                (df["educ4"] == "postgrad").astype(float),
                np.log(df["obama12"] / (1 - df["obama12"])),
            ]
        )
        df["x_beta_true"] = beta[0] + x @ beta[1:]
        df["theta_true"] = _expit(df["x_beta_true"] + v_state[state])
        return df

    small_parts, big_parts, actual_rows = [], [], []
    for s in states:
        nb = int(rng.integers(*big_per_state))
        big = draw_units(s, nb, 0.2, 0.7)
        big["demvote_true"] = (rng.uniform(size=nb) < big["theta_true"]).astype(int)
        actual_rows.append(
            {
                "state": s,
                "name": f"State of {s}",
                "actual": 100.0 * big["theta_true"].mean(),
            }
        )
        big_parts.append(
            big.drop(columns=["x_beta_true", "theta_true", "demvote_true"])
        )
        if s not in absent:
            ns = int(rng.integers(*small_per_state))
            small = draw_units(s, ns, 0.0, 0.5)
            small["demvote"] = (
                rng.uniform(size=ns) < small["theta_true"]
            ).astype(int)
            small_parts.append(small.drop(columns=["x_beta_true", "theta_true"]))

    survey_small = pd.concat(small_parts, ignore_index=True)
    survey_small["ID"] = np.arange(1, len(survey_small) + 1)
    survey_big = pd.concat(big_parts, ignore_index=True)
    survey_big["ID"] = np.arange(1, len(survey_big) + 1)

    return {
        "survey_small": survey_small,
        "survey_big": survey_big,
        "actual_result": pd.DataFrame(actual_rows),
        "truth": {
            "beta": beta.copy(),
            "sigma": sigma,
            "v_state": dict(v_state),
            "absent_states": sorted(absent),
        },
    }
