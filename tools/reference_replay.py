"""Replay the committed parity traces against the ACTUAL PySDM.

Run this on any machine with the reference installed
(``pip install PySDM``) — it is NOT runnable in the pysdm_tpu CI image
(no numba there, which is why the committed expected blocks are generated
by pysdm_tpu and cross-checked here, not the other way round):

    python tools/reference_replay.py tests/data/parity_traces.json

For each case the script rebuilds the identical configuration through the
PySDM API, injects the identical u01 streams at the points where PySDM
consumes them (the croupier shuffle and the per-pair gamma draws —
``dynamics/impl/random_generator_optimizer.py:get_random_arrays``), runs
the same number of steps, and prints a per-step diff report against the
committed pysdm_tpu trajectories. Exit code 0 iff every step agrees
within the tolerances below (the BASELINE.json "fixed RNG stream
allclose vs PySDM" acceptance).

Tolerances: box multiplicities must match EXACTLY (integer algorithm,
identical pairing by construction — see tools/make_parity_traces.py for
the stream-pinning argument); box volumes and parcel thermodynamics to
1e-9 relative; parcel per-drop radii to 1e-5 relative (the two engines
use different bracketed root finders — TOMS748 vs bisection — converged
to the same rtol_x=1e-6).
"""

import json
import sys

import numpy as np

RTOL_THERMO = 1e-9
RTOL_RADII = 1e-5
RTOL_VOLUME = 1e-9


def replay_parcel(block):
    from PySDM import Builder, Formulae
    from PySDM.backends import CPU
    from PySDM.dynamics import AmbientThermodynamics, Condensation
    from PySDM.environments import Parcel

    case = block["case"]
    formulae = Formulae(seed=case["formulae"]["seed"])
    env = Parcel(
        dt=case["env"]["dt"],
        mass_of_dry_air=case["env"]["mass_of_dry_air"],
        p0=case["env"]["p0"],
        initial_water_vapour_mixing_ratio=case["env"][
            "initial_water_vapour_mixing_ratio"
        ],
        T0=case["env"]["T0"],
        w=case["env"]["w"],
    )
    builder = Builder(
        n_sd=case["n_sd"], backend=CPU(formulae), environment=env
    )
    builder.add_dynamic(AmbientThermodynamics())
    builder.add_dynamic(
        Condensation(
            adaptive=case["condensation"]["adaptive"],
            substeps=case["condensation"]["substeps"],
            rtol_x=case["condensation"]["rtol_x"],
            rtol_thd=case["condensation"]["rtol_thd"],
        )
    )
    r_dry = np.asarray(case["r_dry"])
    v_dry = formulae.trivia.volume(radius=r_dry)
    kappa = case["kappa"]
    particulator = builder.build(
        attributes={
            "multiplicity": np.asarray(case["multiplicity"], dtype=float),
            "dry volume": v_dry,
            "kappa times dry volume": kappa * v_dry,
            # the committed equilibrated initial volumes ARE the interface
            "volume": np.asarray(case["volume"]),
        }
    )
    worst = {"thd": 0.0, "qv": 0.0, "RH": 0.0, "radii": 0.0}
    for step, expected in enumerate(block["expected"]):
        particulator.run(1)
        thd = float(particulator.environment["thd"].to_ndarray()[0])
        qv = float(
            particulator.environment[
                "water_vapour_mixing_ratio"
            ].to_ndarray()[0]
        )
        rh = float(particulator.environment["RH"].to_ndarray()[0])
        radii = particulator.attributes["radius"].to_ndarray() * 1e6
        worst["thd"] = max(
            worst["thd"], abs(thd - expected["thd"]) / abs(expected["thd"])
        )
        worst["qv"] = max(
            worst["qv"], abs(qv - expected["qv"]) / abs(expected["qv"])
        )
        worst["RH"] = max(
            worst["RH"], abs(rh - expected["RH"]) / abs(expected["RH"])
        )
        worst["radii"] = max(
            worst["radii"],
            float(
                np.max(
                    np.abs(radii - np.asarray(expected["radii_um"]))
                    / np.asarray(expected["radii_um"])
                )
            ),
        )
    ok = (
        worst["thd"] < RTOL_THERMO
        and worst["qv"] < RTOL_THERMO
        and worst["RH"] < RTOL_THERMO
        and worst["radii"] < RTOL_RADII
    )
    print(f"parcel: worst rel diffs {worst} -> {'OK' if ok else 'FAIL'}")
    return ok


def replay_box(block):
    from PySDM import Builder, Formulae
    from PySDM.backends import CPU
    from PySDM.dynamics import Coalescence
    from PySDM.dynamics.collisions.collision_kernels import ConstantK
    from PySDM.environments import Box

    case = block["case"]
    n_sd = case["n_sd"]
    formulae = Formulae(seed=case["formulae"]["seed"])
    builder = Builder(
        n_sd=n_sd,
        backend=CPU(formulae),
        environment=Box(dt=case["env"]["dt"], dv=case["env"]["dv"]),
    )
    coal = Coalescence(
        collision_kernel=ConstantK(a=case["kernel"]["a"]), adaptive=False
    )
    builder.add_dynamic(coal)
    particulator = builder.build(
        attributes={
            "multiplicity": np.asarray(case["multiplicity"], dtype=float),
            "volume": np.asarray(case["volume"]),
        }
    )
    collision = particulator.dynamics["Collision"]
    gamma_rand = np.asarray(case["gamma_rand"])
    shuffle = np.asarray(case["shuffle_u01"])
    step_box = [0]
    Storage = particulator.Storage

    def injected_random_arrays():
        pairs_rand = Storage.from_ndarray(shuffle)
        rand = Storage.from_ndarray(gamma_rand[step_box[0]])
        return pairs_rand, rand

    collision.rnd_opt_coll.get_random_arrays = injected_random_arrays

    ok = True
    for step, expected in enumerate(block["expected"]):
        step_box[0] = step
        particulator.run(1)
        mult = particulator.attributes["multiplicity"].to_ndarray()
        vol = particulator.attributes["volume"].to_ndarray()
        exact = np.array_equal(
            mult.astype(np.int64), np.asarray(expected["multiplicity"])
        )
        vol_rel = float(
            np.max(
                np.abs(vol - np.asarray(expected["volume"]))
                / np.maximum(np.abs(np.asarray(expected["volume"])), 1e-300)
            )
        )
        step_ok = exact and vol_rel < RTOL_VOLUME
        ok = ok and step_ok
        print(
            f"box step {step}: multiplicities "
            f"{'EXACT' if exact else 'MISMATCH'}, volumes rel {vol_rel:.2e}"
        )
    return ok


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/parity_traces.json"
    with open(path) as f:
        data = json.load(f)
    ok = replay_parcel(data["parcel"])
    ok = replay_box(data["box"]) and ok
    print("REFERENCE PARITY:", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
