"""Builder: wires environment + dynamics + attributes + products into a
Particulator (API parity: reference ``PySDM/builder.py``), then composes and
jit-compiles the per-step function."""

import inspect
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .impl.attributes import canonical_ext_name, EXTENSIVE_NAMES, MAXIMUM_NAMES
from .impl.state import make_particle_state
from .particulator import Particulator


class Builder:
    def __init__(self, n_sd, backend, environment=None):
        self.n_sd = n_sd
        self.particulator = Particulator(n_sd, backend)
        self.formulae = backend.formulae
        self.requested_attributes = {"multiplicity", "cell id"}
        self._counters = {}
        self._flags = {}
        self._extra_env = {}
        self._u01_purposes = []
        self.u01_injection = False
        self.environment = environment
        if environment is not None:
            environment.register(self)

    def _set_environment(self, environment):
        self.environment = environment
        environment.register(self)

    def add_dynamic(self, dynamic):
        # key by base class name as the reference does (builder.py:54-58)
        key = type(dynamic).__mro__[-2].__name__
        key = type(dynamic).__name__ if key == "object" else key
        self.particulator.dynamics[key] = dynamic

    def request_attribute(self, name):
        self.requested_attributes.add(name)

    def get_attribute(self, name):
        self.request_attribute(name)
        return name

    def add_counter(self, name, n_cell, dtype, fill=0):
        dtype = dtype or self.particulator.dtype
        self._counters[name] = jnp.asarray(np.full((n_cell,), fill, dtype=np.dtype(dtype)))

    def enable_u01_injection(self):
        """parity/validation mode (SURVEY.md §7 delta #6): dynamics draw
        their u01 streams from ``sim_state['u01'][purpose]`` — arrays the
        host replaces between single-step dispatches via
        ``particulator.inject_u01`` — instead of the jitted threefry chain.
        This is the hook for seeded cross-checks against the reference
        (inject the identical u01 numbers exactly where PySDM's
        RandomGeneratorOptimizer consumes them). Coverage note: the
        stochastic dynamics are collisions (shuffle/gamma/process/
        fragmentation), freezing and seeding; the reference's condensation
        and displacement consume NO random draws (they are deterministic
        given the state), so a full-physics seeded comparison needs
        injection only at the purposes registered here — see
        tools/make_parity_traces.py for the stream-pinning construction."""
        self.u01_injection = True
        self.particulator.u01_injection = True

    def add_u01_purpose(self, name):
        """called by dynamics in register() to reserve an injected stream"""
        if name not in self._u01_purposes:
            self._u01_purposes.append(name)

    def add_flag(self, name, default: bool):
        """traced on/off switch for a dynamic (host-togglable without
        recompilation — the jit-compatible version of the reference's
        spin-up ``dynamic.enable`` attribute flips)"""
        self._flags[name] = jnp.asarray(bool(default))

    def add_env_field(self, name, value):
        """dynamic-owned env-state entry (e.g. trace-gas mixing ratios)"""
        self._extra_env[name] = jnp.asarray(value)

    def build(self, attributes: dict, products=()):
        particulator = self.particulator
        formulae = self.formulae
        dtype = particulator.dtype

        attributes = dict(attributes)
        if "n" in attributes:  # deprecated alias (reference builder shim)
            warnings.warn("'n' is deprecated, use 'multiplicity'", DeprecationWarning)
            attributes["multiplicity"] = attributes.pop("n")
        if "volume" in attributes and "water mass" not in attributes:
            attributes["water mass"] = np.asarray(
                formulae.particle_shape_and_density.volume_to_mass(
                    np.asarray(attributes.pop("volume"))
                )
            )

        multiplicity = np.asarray(attributes.pop("multiplicity"))
        if np.issubdtype(multiplicity.dtype, np.floating):
            from .initialisation.discretise_multiplicities import (
                discretise_multiplicities,
            )

            multiplicity = discretise_multiplicities(multiplicity)

        # chemistry-derived dry volume (reference
        # ``attributes/physics/dry_volume.py`` DryVolumeDynamic variant):
        # with AqueousChemistry active, dry volume = moles_S_VI * M / rho
        if (
            "dry volume" not in attributes
            and "moles_S_VI" in attributes
            and "AqueousChemistry" in particulator.dynamics
        ):
            chem_dyn = particulator.dynamics["AqueousChemistry"]
            if chem_dyn.dry_rho is not None:
                attributes["dry volume"] = (
                    np.asarray(attributes["moles_S_VI"])
                    * chem_dyn.dry_molar_mass
                    / chem_dyn.dry_rho
                )

        cell_id = attributes.pop("cell id", None)
        cell_origin = attributes.pop("cell origin", None)
        position_in_cell = attributes.pop("position in cell", None)

        # register dynamics first so they can request attributes
        for dynamic in particulator.dynamics.values():
            dynamic.register(self)

        # products register before the state is assembled so that the
        # attributes they request get backing rows (reference builder.py
        # registers products before ParticleAttributesFactory too,
        # ``builder.py:133-148``)
        for product in products:
            product.register(self)
            if product.name in particulator.products:
                raise ValueError(f"duplicate product name: {product.name}")
            particulator.products[product.name] = product

        extensive = {}
        maximum = {}
        for name, value in attributes.items():
            cname = canonical_ext_name(name)
            if cname in EXTENSIVE_NAMES:
                extensive[cname] = np.asarray(value)
            elif cname in MAXIMUM_NAMES:
                maximum[cname] = np.asarray(value)
            else:
                raise ValueError(f"unknown base attribute: {name}")
        # requested extensive attributes not user-initialised default to zero
        for name in self.requested_attributes:
            cname = canonical_ext_name(name)
            if cname in EXTENSIVE_NAMES and cname not in extensive:
                if cname in ("signed water mass",):
                    raise ValueError("water mass / volume must be initialised")
                extensive[cname] = np.zeros(multiplicity.shape[0])
        # stateful derived attributes need a backing per-particle row,
        # initialised to NaN ("not yet recorded") as in the reference
        # (``attributes/ice/cooling_rate.py:20-22``,
        # ``ice/freezing_temperature.py`` TemperatureOfLastFreezing)
        if "cooling rate" in self.requested_attributes:
            self.requested_attributes.add("cooling rate prev T")
        for name in self.requested_attributes:
            if name in MAXIMUM_NAMES and name not in maximum:
                if name == "freezing temperature":
                    raise ValueError(
                        "freezing temperature must be initialised"
                        " (spectro-glacial sampling)"
                    )
                maximum[name] = np.full(multiplicity.shape[0], np.nan)

        particles = make_particle_state(
            multiplicity=multiplicity,
            extensive=extensive,
            maximum=maximum,
            cell_id=cell_id,
            cell_origin=cell_origin,
            position_in_cell=position_in_cell,
            mult_dtype=particulator.mult_dtype,
            dtype=dtype,
        )

        particulator._resolver.dt = particulator.dt
        env_state = self.environment.init_env_state(dtype)
        for name, value in self._extra_env.items():
            env_state[name] = jnp.asarray(value, dtype=dtype)
        key = jax.random.PRNGKey(formulae.seed)
        particulator.sim_state = {
            "particles": particles,
            "env": env_state,
            "counters": dict(self._counters),
            "flags": dict(self._flags),
            "key": key,
        }
        if self.u01_injection:
            particulator.sim_state["u01"] = {
                name: jnp.zeros(self.n_sd, dtype=dtype)
                for name in self._u01_purposes
            }

        # shared-sort analysis: one full-state sort per step instead of one
        # per sorting dynamic. Static fixpoint over the (static) dynamics
        # order: Collision's bucket shuffle leaves the state cell-sorted,
        # Displacement/Seeding break it, Condensation consumes it (skipping
        # its own stable sort when the invariant provably holds at its
        # position — including across the step boundary: the warm-rain
        # order Cond -> Advection -> Displacement -> Collision ends sorted,
        # which is exactly what the next step's Condensation needs). The
        # start-of-step state must match the end-of-step state (the same
        # compiled step runs every iteration), so the assumption is only
        # adopted when the fixpoint closes; the initial state is pre-sorted
        # below to seed it. n_cell == 1 is vacuously sorted.
        # deferred commit steps (comm/compute overlap: a dynamic may split
        # its communication into start-inside-its-step + commit-after-the-
        # last-physics-dynamic; the commit scatters arrivals into grave
        # slots and so breaks the cell-sorted invariant at END of step)
        commit_fns = [
            (dname + "Commit", fn)
            for dname, dyn in particulator.dynamics.items()
            if hasattr(dyn, "make_commit_step")
            for fn in [dyn.make_commit_step(particulator)]
            if fn is not None
        ]

        def _sort_fixpoint(start):
            flags = {}
            f = start
            for dname, dyn in particulator.dynamics.items():
                if getattr(dyn, "wants_cell_sort", False):
                    flags[dname] = f
                    f = True  # it sorts if the invariant didn't hold
                if getattr(dyn, "restores_cell_sort", False):
                    f = True
                if getattr(dyn, "breaks_cell_sort", False):
                    f = False
            if commit_fns:
                f = False
            return flags, f

        n_cell = particulator.mesh.n_cell
        flags, end_sorted = _sort_fixpoint(True)
        if not end_sorted and n_cell > 1:
            flags, _ = _sort_fixpoint(False)
        presort = False
        for dname, dyn in particulator.dynamics.items():
            if getattr(dyn, "wants_cell_sort", False):
                assume = n_cell == 1 or flags.get(dname, False)
                dyn._assume_sorted = assume
                presort = presort or (assume and n_cell > 1)
            if getattr(dyn, "restores_cell_sort", False):
                # a spin-up-disabled collision must still sort when a
                # consumer downstream (possibly next step) relies on it
                dyn._sort_when_disabled = presort or any(
                    flags.get(d, False) for d in flags
                )
        if presort:
            from .ops.segments import sort_state_by_cell

            particles, _, _ = sort_state_by_cell(
                particulator.sim_state["particles"], n_cell, particulator.mesh
            )
            particulator.sim_state["particles"] = particles

        # compose per-step function from dynamics (insertion order is
        # semantically significant — reference particulator.py:50-56)
        named_step_fns = [
            (name, dynamic.make_step(particulator))
            for name, dynamic in particulator.dynamics.items()
            if hasattr(dynamic, "make_step")
        ]
        named_step_fns.extend(commit_fns)
        # environment predicted->current commit runs last (the reference's
        # swap-on-notify observer ordering, particulator.py:58-61)
        if hasattr(self.environment, "make_commit_step"):
            named_step_fns.append(
                ("EnvCommit", self.environment.make_commit_step(particulator))
            )
        if "cooling rate" in self.requested_attributes:
            # record this step's committed ambient T per particle, so the
            # next step's "cooling rate" reads (T_prev - T_now)/dt — the
            # reference's CoolingRate.notify() observer
            # (``attributes/ice/cooling_rate.py:23-29``)
            def record_prev_T(sim):
                p = sim["particles"]
                p = p.set_max(
                    "cooling rate prev T",
                    sim["env"]["T"][p.cell_id].astype(dtype),
                )
                return {**sim, "particles": p}

            named_step_fns.append(("CoolingRatePrevT", record_prev_T))
        step_fns = [fn for _, fn in named_step_fns]
        # opt-in per-dynamic dispatch mode (one jit per dynamic) — lets
        # DynamicWallTime observe real per-dynamic splits that the fused
        # step hides (reference per-dynamic WallTimers, builder.py:157-158)
        particulator._named_step_fns = [
            (name, jax.jit(fn)) for name, fn in named_step_fns
        ]
        particulator._named_step_fns_raw = named_step_fns

        def full_step(sim):
            for fn in step_fns:
                sim = fn(sim)
            return sim

        particulator._step_fn_raw = full_step  # for shard_map wrapping
        particulator._step_fn = jax.jit(full_step)

        def multi_step(sim, n):
            return jax.lax.fori_loop(0, n, lambda _, s: full_step(s), sim)

        particulator._multi_step_fn = jax.jit(multi_step)

        return particulator
