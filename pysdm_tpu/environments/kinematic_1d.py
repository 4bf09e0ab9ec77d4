"""Single-column prescribed-flow environment (parity: reference
``PySDM/environments/kinematic_1d.py``).

thd/rhod are fixed-in-time profiles of z (thd evolves only through
condensational heating, it is not advected — reference ``get_thd`` returns the
stored profile); the water-vapour mixing ratio is the MPDATA advectee. The
env-state dict carries current/predicted pairs plus the ``mpdata_*`` advectee
buffers shuttled by the EulerianAdvection dynamic."""

import jax.numpy as jnp
import numpy as np

from .impl.moist import recalc_thermo, moist_commit


class Kinematic1D:
    def __init__(
        self, *, dt, mesh, thd_of_z, rhod_of_z, water_vapour_mixing_ratio_of_z, z0=0
    ):
        self.dt = dt
        self.mesh = mesh
        self.z0 = z0
        nz = mesh.grid[-1]
        z_centres = z0 + mesh.dz * (np.arange(nz) + 0.5)
        self.thd0 = np.asarray(thd_of_z(z_centres), dtype=float)
        self.rhod0 = np.asarray(rhod_of_z(z_centres), dtype=float)
        self.qv0 = np.asarray(
            water_vapour_mixing_ratio_of_z(z_centres), dtype=float
        )
        self.particulator = None
        self.formulae = None

    def register(self, builder):
        self.particulator = builder.particulator
        self.formulae = builder.particulator.formulae
        builder.particulator.mesh = self.mesh
        builder.particulator.dt = self.dt
        builder.particulator.environment = self
        T, p, RH, air_density, air_viscosity = (
            np.asarray(x)
            for x in recalc_thermo(self.formulae, self.thd0, self.qv0, self.rhod0)
        )
        self._initial = {
            "thd": self.thd0, "rhod": self.rhod0, "qv": self.qv0,
            "T": T, "p": p, "RH": RH,
            "air_density": air_density, "air_viscosity": air_viscosity,
        }

    @property
    def dv(self):
        return self.mesh.dv

    def __getitem__(self, key):
        if self.particulator is not None and self.particulator.sim_state:
            return np.asarray(self.particulator.sim_state["env"][key])
        return self._initial[key]

    def init_env_state(self, dtype):
        f = self.formulae
        thd = jnp.asarray(self.thd0, dtype=dtype)
        qv = jnp.asarray(self.qv0, dtype=dtype)
        rhod = jnp.asarray(self.rhod0, dtype=dtype)
        T, p, RH, air_density, air_viscosity = recalc_thermo(f, thd, qv, rhod)
        nz = self.mesh.grid[-1]
        return {
            "thd": thd, "qv": qv, "rhod": rhod,
            "pred_thd": thd, "pred_qv": qv, "pred_rhod": rhod,
            "mpdata_thd": thd, "mpdata_qv": qv,
            "T": T, "p": p, "RH": RH,
            "air_density": air_density, "air_viscosity": air_viscosity,
            "m_d": rhod * self.mesh.dv,
            "delta_qv_cond": jnp.zeros_like(qv),
            "courant_0": jnp.zeros((nz + 1,), dtype=dtype),
            "t": jnp.zeros((), dtype=dtype),
        }

    def make_sync_step(self, particulator):
        f = particulator.formulae

        def sync(sim):
            env = dict(sim["env"])
            env["pred_qv"] = env["mpdata_qv"]
            env["pred_thd"] = env["mpdata_thd"]
            env["pred_rhod"] = env["rhod"]
            (env["T"], env["p"], env["RH"], env["air_density"],
             env["air_viscosity"]) = recalc_thermo(
                f, env["pred_thd"], env["pred_qv"], env["pred_rhod"]
            )
            return {**sim, "env": env}

        return sync

    def make_commit_step(self, particulator):
        dt = self.dt

        def commit(sim):
            env = moist_commit(sim["env"])
            env["t"] = env["t"] + dt
            return {**sim, "env": env}

        return commit

    def init_attributes(
        self,
        *,
        spatial_discretisation,
        spectral_discretisation,
        kappa,
        z_part=None,
        collisions_only=False,
        seed=None,
    ):
        """reference ``Kinematic1D.init_attributes``: pseudo-random positions,
        per-kg spectrum -> multiplicity via rhod(cell) * domain volume,
        optional wet-radius equilibration"""
        f = self.formulae
        n_sd = self.particulator.n_sd
        positions = spatial_discretisation.sample(
            grid=self.mesh.grid,
            n_sd=n_sd,
            z_part=z_part,
            seed=seed if seed is not None else f.seed,
        )
        attributes = {}
        (
            attributes["cell id"],
            attributes["cell origin"],
            attributes["position in cell"],
        ) = self.mesh.cellular_attributes(positions)

        if collisions_only:
            v_wet, n_per_kg = spectral_discretisation.sample(n_sd=n_sd)
            attributes["volume"] = v_wet
        else:
            r_dry, n_per_kg = spectral_discretisation.sample(n_sd=n_sd)
            attributes["dry volume"] = np.asarray(f.trivia.volume(radius=r_dry))
            attributes["kappa times dry volume"] = (
                attributes["dry volume"] * kappa
            )
            from ..initialisation.equilibrate_wet_radii import equilibrate_wet_radii

            r_wet = equilibrate_wet_radii(
                r_dry=r_dry,
                environment=self,
                cell_id=attributes["cell id"],
                kappa_times_dry_volume=attributes["kappa times dry volume"],
            )
            attributes["volume"] = np.asarray(f.trivia.volume(radius=r_wet))

        cell_id = attributes["cell id"]
        domain_volume = float(np.prod(np.asarray(self.mesh.size)))
        attributes["multiplicity"] = n_per_kg * self.rhod0[cell_id] * domain_volume
        return attributes
