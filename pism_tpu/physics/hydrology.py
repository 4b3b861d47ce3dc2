"""Subglacial hydrology.

Rebuild of PISM ``src/hydrology/``:

- ``NullTransport``: the till-water-layer ODE only (all PISM hydrology
  models share it): dW_till/dt = (rho_i/rho_w) m_b - C, clipped to
  [0, W_max]. No lateral transport.
- ``Routing``: conservative lateral routing of a transportable water layer W
  along the hydraulic potential, with its own CFL-subcycled explicit steps
  (flux q = -k W^alpha |grad psi|^(beta-2) grad psi), feeding the till layer
  first. Implemented as a fixed-count lax.fori_loop of masked upwind steps.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import state as S
from ..ops import stencils as st
from ..ops.stencils import Shifter


@dataclass
class NullTransport:
    """PISM ``hydrology::NullTransport``."""

    grid: object
    config: object

    #: optional prescribed surface water input rate [m/s] (reference
    #: hydrology.surface_input.file, variable water_input_rate)
    surface_input: object = None

    def __post_init__(self):
        cfg = self.config
        self.W_max = cfg.get_number("hydrology.tillwat_max")
        self.C = cfg.get_number("hydrology.tillwat_decay_rate", "m s-1")
        self.rho_i = cfg.get_number("constants.ice.density")
        self.rho_w = cfg.get_number("constants.fresh_water.density")
        self.decay_grounded_only = cfg.get_flag(
            "hydrology.tillwat_decay_rate_grounded_only")
        self.add_to_till = cfg.get_flag(
            "hydrology.add_water_input_to_till_storage")
        self.input_from_runoff = cfg.get_flag(
            "hydrology.surface_input_from_runoff")
        self._dt_max = cfg.get_number("hydrology.maximum_time_step",
                                      "seconds")

    def max_timestep(self):
        """Reference hydrology.maximum_time_step (a dt cap for every
        hydrology model; <= 0 disables)."""
        return self._dt_max if self._dt_max > 0.0 else None

    def _water_input(self, state, W, runoff=None):
        """Total water input rate [m/s]: basal melt + optional surface
        input (file field and/or surface-model runoff, reference
        hydrology.surface_input.file / .surface_input_from_runoff)."""
        m_b = state.basal_melt_rate
        if m_b is None:
            m_b = jnp.zeros_like(W)
        inflow = (self.rho_i / self.rho_w) * m_b
        if self.surface_input is not None:
            inflow = inflow + jnp.asarray(self.surface_input, W.dtype)
        if self.input_from_runoff and runoff is not None:
            inflow = inflow + jnp.asarray(runoff, W.dtype)
        return inflow

    def step(self, state: S.ModelState, dt, runoff=None) -> S.ModelState:
        W = state.tillwat
        if W is None:
            W = jnp.zeros_like(state.geometry.ice_thickness)
        inflow = self._water_input(state, W, runoff)
        if not self.add_to_till:
            # input bypasses the till (it goes to the transport layer in
            # Routing.step); the till still decays
            inflow = jnp.zeros_like(W)
        decay = self.C
        if self.decay_grounded_only:
            decay = jnp.where(S.grounded_ice(state.geometry.cell_type),
                              self.C, 0.0)
        W = jnp.clip(W + dt * (inflow - decay), 0.0, self.W_max)
        # no till water under floating ice or ocean
        W = jnp.where(S.ocean(state.geometry.cell_type), 0.0, W)
        return state.replace(tillwat=W)


@dataclass
class Routing(NullTransport):
    """PISM ``hydrology::Routing``: lateral routing of a transportable
    water layer along the hydraulic potential psi = rho_w g b +
    P_overburden (zero till-effective-pressure approximation), explicit
    upwind steps subcycled on the water-advection CFL condition (the
    reference computes the same per-substep bound in
    ``Routing::max_timestep_W_cfl``; a fixed substep count would silently
    rate-limit the flux whenever the CFL were violated). The subcycle loop
    is a ``lax.while_loop``; termination is guaranteed by the
    ``dt / max_subcycles`` floor on each substep."""

    cfl_factor: float = 0.5
    max_subcycles: int = 1024

    def __post_init__(self):
        super().__post_init__()
        cfg = self.config
        self.cfl_factor = cfg.get_number("hydrology.routing.cfl_factor")
        self.k = cfg.get_number("hydrology.hydraulic_conductivity")
        # reference names win when explicitly set; hydrology.alpha/beta are
        # the rebuild's short aliases
        self.alpha = cfg.get_number("hydrology.thickness_power_in_flux") \
            if cfg.is_set("hydrology.thickness_power_in_flux") \
            else cfg.get_number("hydrology.alpha")
        self.beta_exp = cfg.get_number("hydrology.gradient_power_in_flux") \
            if cfg.is_set("hydrology.gradient_power_in_flux") \
            else cfg.get_number("hydrology.beta")
        self.include_floating = cfg.get_flag(
            "hydrology.routing.include_floating_ice")
        self.g = cfg.get_number("constants.standard_gravity")
        self.sh = Shifter(self.grid)

    def _face_gradients(self, psi):
        """Staggered potential gradients and face gradient magnitudes."""
        grid, sh = self.grid, self.sh
        dpx = st.grad_x_east(psi, grid.dx, sh)
        dpy = st.grad_y_north(psi, grid.dy, sh)
        gpe = jnp.sqrt(dpx ** 2 + st.grad_y_east(psi, grid.dy, sh) ** 2) + 1e-12
        gpn = jnp.sqrt(st.grad_x_north(psi, grid.dx, sh) ** 2 + dpy ** 2) + 1e-12
        return dpx, dpy, gpe, gpn

    def _wave_speed(self, W, gpe, gpn):
        """Upper bound on the kinematic wave speed dq/dW = k a W^(a-1) g^(b-1)."""
        Wmax = jnp.max(W)
        gmax = jnp.maximum(jnp.max(gpe), jnp.max(gpn))
        return self.k * self.alpha * jnp.maximum(Wmax, 1e-12) \
            ** (self.alpha - 1.0) * gmax ** (self.beta_exp - 1.0)

    def _cfl_subcycle(self, dt, W0, potential_fn, substep_fn, extra0=None):
        """Advance W (and optional extra state) over [0, dt] with CFL-bounded
        explicit substeps. ``potential_fn(W, extra) -> psi``;
        ``substep_fn(W, extra, dt_sub, face_grads) -> (W, extra)``."""
        grid = self.grid
        dx_min = min(grid.dx, grid.dy)
        dt_floor = dt / self.max_subcycles

        def cond(carry):
            _, _, t_done = carry
            return t_done < dt

        def body(carry):
            W, extra, t_done = carry
            psi = potential_fn(W, extra)
            grads = self._face_gradients(psi)
            _, _, gpe, gpn = grads
            v = self._wave_speed(W, gpe, gpn)
            t_left = dt - t_done
            dt_sub = jnp.clip(self.cfl_factor * dx_min / jnp.maximum(v, 1e-30),
                              dt_floor, t_left)
            W, extra = substep_fn(W, extra, dt_sub, grads)
            return W, extra, t_done + dt_sub

        if extra0 is None:
            extra0 = jnp.zeros(())
        W, extra, _ = jax.lax.while_loop(
            cond, body, (W0, extra0, jnp.zeros((), W0.dtype)))
        return W, extra

    def step(self, state: S.ModelState, dt, runoff=None) -> S.ModelState:
        state = NullTransport.step(self, state, dt, runoff)  # till first
        grid, sh = self.grid, self.sh
        H = state.geometry.ice_thickness
        b = state.geometry.bed_elevation
        W = state.hydro_W
        if W is None:
            W = jnp.zeros_like(H)

        # overflow of the till layer feeds the transportable layer; with
        # add_water_input_to_till_storage off, ALL input bypasses the till
        inflow = self._water_input(state, W, runoff)
        if self.add_to_till:
            overflow = jnp.where(state.tillwat >= self.W_max, inflow, 0.0)
        else:
            overflow = inflow

        psi = self.rho_w * self.g * b + self.rho_i * self.g * H
        # reference hydrology.routing.include_floating_ice: route under
        # shelves too (only open ocean is excluded)
        if self.include_floating:
            ocean = state.geometry.cell_type == S.MASK_ICE_FREE_OCEAN
        else:
            ocean = S.ocean(state.geometry.cell_type)

        def substep(W, extra, dt_sub, grads):
            dpx, dpy, gpe, gpn = grads
            # upwind W onto faces by the flux direction (downgradient)
            We = jnp.where(dpx <= 0.0, W, sh(W, 0, 1))
            Wn = jnp.where(dpy <= 0.0, W, sh(W, 1, 0))
            Ke = self.k * We ** self.alpha * gpe ** (self.beta_exp - 2.0)
            Kn = self.k * Wn ** self.alpha * gpn ** (self.beta_exp - 2.0)
            qe = -Ke * dpx
            qn = -Kn * dpy
            # donor-cell limiting to keep W >= 0
            from ..model.geometry_evolution import limit_flux
            qe, qn = limit_flux(qe, qn, W, dt_sub, grid.dx, grid.dy, sh)
            div = st.div_staggered(qe, qn, grid.dx, grid.dy, sh)
            W_new = jnp.maximum(W + dt_sub * (overflow - div), 0.0)
            return jnp.where(ocean, 0.0, W_new), extra

        W, _ = self._cfl_subcycle(dt, W, lambda W_, e: psi, substep)
        return state.replace(hydro_W=W)


@dataclass
class Distributed(Routing):
    """PISM ``hydrology::Distributed`` (Bueler & van Pelt 2015): linked
    cavities with an evolving water pressure P. On top of the routing
    transport (with the hydraulic potential psi = P + rho_w g b), the
    pressure evolves from the cavity volume balance:

        dP/dt = (rho_w g / phi0) [ O(W) - C(W, P) - dW/dt|transport ]

    with cavity opening O = c1 |u_b| (W_r - W)_+ and creep closure
    C = c2 A P_eff^3 W, P_eff = P_overburden - P, clipped to
    0 <= P <= P_overburden. The sliding speed enters from the model state's
    basal velocity.
    """

    def __post_init__(self):
        super().__post_init__()
        cfg = self.config
        self.phi0 = cfg.get_number("hydrology.distributed.phi_0") \
            if cfg.is_set("hydrology.distributed.phi_0") \
            else cfg.get_number("hydrology.regularizing_porosity")
        self.Wr = cfg.get_number("hydrology.roughness_scale")
        self.c1 = cfg.get_number("hydrology.cavitation_opening_coefficient")
        self.c2 = cfg.get_number("hydrology.creep_closure_coefficient")
        self.A_soft = cfg.get_number("flow_law.isothermal_Glen.ice_softness")
        self.g_ = cfg.get_number("constants.standard_gravity")

    def step(self, state: S.ModelState, dt, runoff=None) -> S.ModelState:
        state = NullTransport.step(self, state, dt, runoff)
        grid, sh = self.grid, self.sh
        H = state.geometry.ice_thickness
        b = state.geometry.bed_elevation
        W = state.hydro_W if state.hydro_W is not None else jnp.zeros_like(H)
        P = state.hydro_P
        P_ov = self.rho_i * self.g_ * H
        if P is None:
            P = P_ov  # start at overburden

        u = state.u_ssa if state.u_ssa is not None else jnp.zeros_like(H)
        v = state.v_ssa if state.v_ssa is not None else jnp.zeros_like(H)
        speed = jnp.sqrt(u ** 2 + v ** 2)

        m_b = state.basal_melt_rate if state.basal_melt_rate is not None \
            else jnp.zeros_like(H)
        inflow = (self.rho_i / self.rho_w) * m_b
        overflow = jnp.where(state.tillwat >= self.W_max, inflow, 0.0)
        ocean = S.ocean(state.geometry.cell_type)

        def substep(W, P, dt_sub, grads):
            dpx, dpy, gpe, gpn = grads
            We = jnp.where(dpx <= 0.0, W, sh(W, 0, 1))
            Wn = jnp.where(dpy <= 0.0, W, sh(W, 1, 0))
            qe = -self.k * We ** self.alpha * gpe ** (self.beta_exp - 2.0) * dpx
            qn = -self.k * Wn ** self.alpha * gpn ** (self.beta_exp - 2.0) * dpy
            from ..model.geometry_evolution import limit_flux
            qe, qn = limit_flux(qe, qn, W, dt_sub, grid.dx, grid.dy, sh)
            div = st.div_staggered(qe, qn, grid.dx, grid.dy, sh)
            dW_trans = overflow - div
            W_new = jnp.maximum(W + dt_sub * dW_trans, 0.0)

            opening = self.c1 * speed * jnp.maximum(self.Wr - W, 0.0)
            P_eff = jnp.maximum(P_ov - P, 0.0)
            closure = self.c2 * self.A_soft * P_eff ** 3 * W
            # van Pelt & Bueler closure: (phi0/rho_w g) dP/dt
            #   = dW/dt|transport - (opening - closure)
            dP = (self.rho_w * self.g_ / self.phi0) * \
                (dW_trans - (opening - closure))
            P_new = jnp.clip(P + dt_sub * dP, 0.0, P_ov)
            return jnp.where(ocean, 0.0, W_new), jnp.where(ocean, 0.0, P_new)

        W, P = self._cfl_subcycle(
            dt, W, lambda W_, P_: P_ + self.rho_w * self.g_ * b,
            substep, extra0=P)
        return state.replace(hydro_W=W, hydro_P=P)


@dataclass
class Steady(NullTransport):
    """PISM ``hydrology::SteadyState`` role (reference
    ``src/hydrology/SteadyState.cc``): the basal water input is routed
    *instantaneously* down the hydraulic potential to the ice margin,
    producing the steady subglacial discharge field that feeds the
    ``DischargeRouting`` frontal-melt plume. It does not evolve a water
    layer of its own (the till ODE still runs).

    The reference's serial flow-accumulation pass becomes an all-device
    fixed point: each cell sends its accumulated flux to its
    steepest-descent neighbor; iterate Q <- input + sum(upstream Q) until
    stationary (bounded by the longest flow path, like the iceberg-remover
    label propagation).
    """

    max_iters: int = 4096

    def __post_init__(self):
        super().__post_init__()
        self.g = self.config.get_number("constants.standard_gravity")
        self.sh = Shifter(self.grid)
        self.max_iters = self.config.get_int(
            "hydrology.steady_max_iterations")

    def step(self, state: S.ModelState, dt, runoff=None,
             t=None) -> S.ModelState:
        state = NullTransport.step(self, state, dt, runoff)
        # reference hydrology.steady.flux_update_interval: the (expensive)
        # flow-accumulation fixed point only reruns when the step crosses
        # an interval boundary; between updates the stored discharge field
        # is carried unchanged (SteadyState.cc does the same)
        T = self.config.get_number("hydrology.steady.flux_update_interval",
                                   "seconds")
        if t is not None and T > 0.0 and state.hydro_Q is not None:
            crossed = jnp.floor(t / T) > jnp.floor((t - dt) / T)
            return jax.lax.cond(crossed,
                                lambda s: self._solve_flux(s),
                                lambda s: s, state)
        return self._solve_flux(state)

    def _solve_flux(self, state: S.ModelState) -> S.ModelState:
        sh = self.sh
        g = state.geometry
        H = g.ice_thickness
        icy = S.icy(g.cell_type)

        # water input rate [m^3/s] per cell (till overflow approximation:
        # all melt routes once the till is saturated; matches Routing)
        m_b = state.basal_melt_rate if state.basal_melt_rate is not None \
            else jnp.zeros_like(H)
        inflow = (self.rho_i / self.rho_w) * m_b
        overflow = jnp.where(icy & (state.tillwat >= self.W_max), inflow, 0.0)
        inp = overflow * self.grid.dx * self.grid.dy

        # steepest-descent direction of the hydraulic potential among the
        # 4 neighbors; 0 = sink (local minimum or margin), 1..4 = E,W,N,S
        psi = self.rho_w * self.g * g.bed_elevation + self.rho_i * self.g * H
        big = jnp.asarray(jnp.inf, psi.dtype)
        # water leaving the icy region exits the system: neighbors outside
        # the ice are "free" outlets at -inf potential
        def nbr_psi(dy_, dx_):
            p = sh(psi, dy_, dx_)
            return jnp.where(sh(icy, dy_, dx_), p, -big)
        cand = jnp.stack([nbr_psi(0, 1), nbr_psi(0, -1),
                          nbr_psi(1, 0), nbr_psi(-1, 0)])
        best = jnp.argmin(cand, axis=0)
        downhill = jnp.min(cand, axis=0) < psi
        direction = jnp.where(icy & downhill, best + 1, 0)

        # neighbor-existence masks: non-periodic shifts clamp at the domain
        # edge, which would alias a boundary cell as its own upstream
        # neighbor (a self-loop that never converges)
        shape = psi.shape
        ix = jnp.broadcast_to(jnp.arange(shape[1])[None, :], shape)
        iy = jnp.broadcast_to(jnp.arange(shape[0])[:, None], shape)
        true_ = jnp.ones(shape, bool)
        has_e = true_ if self.grid.periodic_x else ix < shape[1] - 1
        has_w = true_ if self.grid.periodic_x else ix > 0
        has_n = true_ if self.grid.periodic_y else iy < shape[0] - 1
        has_s = true_ if self.grid.periodic_y else iy > 0

        def send(Q):
            """Sum of upstream neighbors' Q draining into each cell."""
            # a neighbor at +x drains into me if its direction is W (=2), etc.
            return (jnp.where(has_e & (sh(direction, 0, 1) == 2),
                              sh(Q, 0, 1), 0.0)
                    + jnp.where(has_w & (sh(direction, 0, -1) == 1),
                                sh(Q, 0, -1), 0.0)
                    + jnp.where(has_n & (sh(direction, 1, 0) == 4),
                                sh(Q, 1, 0), 0.0)
                    + jnp.where(has_s & (sh(direction, -1, 0) == 3),
                                sh(Q, -1, 0), 0.0))

        def cond(carry):
            Q, Q_prev, it = carry
            return (it < self.max_iters) & jnp.any(Q != Q_prev)

        def body(carry):
            Q, _, it = carry
            return inp + send(Q), Q, it + 1

        Q0 = inp
        Q, _, _ = jax.lax.while_loop(
            cond, body, (Q0, jnp.full_like(Q0, -1.0),
                         jnp.zeros((), jnp.int32)))
        # per-unit-width discharge [m^2/s] through the cell's outflow face
        # (east/west faces span dy, north/south faces span dx)
        face_len = jnp.where((direction == 1) | (direction == 2),
                             self.grid.dy, self.grid.dx)
        q_sg = Q / face_len
        return state.replace(hydro_Q=q_sg)


def hydrology_from_config(grid, config):
    name = config.get_string("hydrology.model")
    surface_input = None
    path = config.get_string("hydrology.surface_input.file")
    if path:
        # reference hydrology.surface_input.file: prescribed water input
        # rate [kg m-2 year-1 in files; m/s internally]
        from ..io.bootstrap import read_forcing_fields
        fields, _ = read_forcing_fields(path, grid, ["water_input_rate"])
        if "water_input_rate" not in fields:
            raise ValueError(
                f"hydrology.surface_input.file {path!r}: no water_input_rate")
        a = fields["water_input_rate"]
        surface_input = jnp.asarray(a[-1] if a.ndim == 3 else a)
    kw = dict(grid=grid, config=config, surface_input=surface_input)
    if name in ("null", ""):
        return NullTransport(**kw)
    if name == "routing":
        return Routing(**kw)
    if name == "distributed":
        return Distributed(**kw)
    if name == "steady":
        return Steady(**kw)
    raise ValueError(f"unknown hydrology model {name!r}")
