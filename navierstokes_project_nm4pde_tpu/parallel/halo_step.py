"""A FULL IPCS projection time step under the owned+halo DoF sharding.

parallel/halo.py ends at the SpMV boundary (halo_apply_system); this
module carries the owned/ghost execution model through a complete
production time step -- the reference runs its whole solve, Krylov loops
included, on owned+ghost vectors (ref: src/NavierStokes2D.cpp:71-87
owned/relevant DoFs, :315-320 compress()).  TPU mapping:

  * VELOCITY (94% of the DoFs) is block-sharded in the owned layout;
    every element pass gathers the halo slabs via `lax.ppermute` ring
    shifts and every Krylov reduction is a `psum` of device-local dots
    (solvers/krylov.py `axis_name`) -- per-device cross-chip bytes scale
    with the subdomain boundary, not the global problem.
  * PRESSURE (a few hundred KB) is REPLICATED: the divergence rhs is
    one psum of per-device partial assemblies, and the frozen-Schur CG
    (banded/ELL + additive two-level, all setup-time constants) runs
    identically on every device -- the coarse solve is replicated
    exactly as the verdict's owned+halo design calls for.

Scope (asserted in __init__): the judged projection stack with BDF1,
implicit convection, f_iters=0 (Jacobi-diagonal velocity FGMRES),
frozen Schur, additive two-level CG, tol_mode="b", no warm-start
extrapolation, no forcing/Neumann/backflow.  Equality vs the
single-device `_step_projection` is tested on 8 CPU devices
(tests/test_halo_step.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from navierstokes_project_nm4pde_tpu.ops import operators as ops
from navierstokes_project_nm4pde_tpu.ops.coarse import (
    cho_solve_c,
    inv_solve_c,
    twolevel_apply_additive_g,
)
from navierstokes_project_nm4pde_tpu.ops.schur_ell import schur_ell_matvec
from navierstokes_project_nm4pde_tpu.parallel.halo import (
    HaloPlan,
    _gather_ext,
    _reduce_ext,
    build_halo_plan,
    to_natural,
)
from navierstokes_project_nm4pde_tpu.parallel.sharding import (
    _pad_cells,
    shard_operator,
)
from navierstokes_project_nm4pde_tpu.solvers.krylov import cg, fgmres, _norm


class HaloProjectionStep:
    """Callable one-step driver: (u_owned, p, step_idx) -> (u_owned, p,
    (f_iters, s_iters)).  Build once per (solver, device mesh); `shard`
    and `unshard` move velocity states in and out of the owned layout."""

    def __init__(self, solver, dmesh: Mesh):
        cfg = solver.config
        t = cfg.time
        assert t.stepper == "projection" and t.scheme == "bdf1", (
            "halo step supports the projection stepper with BDF1"
        )
        assert t.convection == "implicit", "halo step: implicit convection"
        assert cfg.precond.f_iters == 0, "halo step: Jacobi-diag F precond"
        assert cfg.precond.mg2_form == "additive"
        assert cfg.solver.tol_mode == "b"
        assert not cfg.solver.extrapolate_guess, (
            "halo step: warm-start extrapolation not carried"
        )
        fz = solver._dev.proj_schur
        assert fz is not None, "halo step needs the frozen projection Schur"
        assert solver._dev.backflow is None
        assert solver.problem.forcing is None
        assert solver._dev.neumann is None

        self.solver = solver
        self.dmesh = dmesh
        self.axis = dmesh.axis_names[0]
        n_dev = dmesh.devices.size
        self.n_dev = n_dev

        op = solver.op
        # The halo plan works on the cell-padded operator; shard_operator
        # both pads and cell-shards the geometry (and strips the
        # node-space-assembled round-3 forms, which do not follow the
        # cell axis).
        op_pad = _pad_cells(op, n_dev)
        self.plan: HaloPlan = build_halo_plan(
            op_pad, n_dev, n_vertices=solver.space.mesh.n_vertices
        )
        self.op_sh = shard_operator(op, dmesh)
        self.fz = fz

        from navierstokes_project_nm4pde_tpu.precond.blocks import (
            build_precond_state,
        )

        # BDF1 + freeze_conv_diag: the Jacobi diagonal of F is constant.
        pst = build_precond_state(
            op, solver.problem.nu, t.dt, None, "yosida",
            s_solver="mg2", f_solver=cfg.precond.f_solver, skip_schur=True,
        )

        # Owned-layout constants.  `iperm` inverts the ownership
        # permutation as a GATHER (owned position -> natural row id,
        # padding rows -> an appended zero row).
        def inv_perm(side):
            perm = np.asarray(side.perm)
            ip = np.full(self.n_dev * side.n_loc, side.n_rows, np.int64)
            ip[perm] = np.arange(side.n_rows)
            return jnp.asarray(ip, jnp.int32)

        self.iperm_u = inv_perm(self.plan.u)
        u_sh = NamedSharding(dmesh, P(self.axis))
        self.u_sharding = u_sh
        # natural-id pressure connectivity, stacked one block per device
        # (the replicated pressure needs no halo remap)
        self.cp_nat = jnp.asarray(
            np.asarray(op_pad.cells_p).reshape(
                n_dev, -1, np.asarray(op_pad.cells_p).shape[1]
            )
        )

        def own_u(x, pad_value=0.0):
            xp = jnp.concatenate(
                [x, jnp.full((1,) + x.shape[1:], pad_value, x.dtype)], 0
            )
            return jax.device_put(xp[self.iperm_u], u_sh)

        self._own_u = own_u
        self.mask_own = own_u(
            op.dirichlet_mask.astype(solver.dtype)
        ) > 0.5
        self.invdiag_own = own_u(pst.inv_diag_Fhat)
        self.upd_own = own_u(t.dt * fz.inv1)  # dt_eff * diag(M)^-1, free
        self.inv_d = 1.0 / fz.diag1
        if fz.inv_c is not None:
            self._solve_c = inv_solve_c(fz.inv_c)
            self._coarse_arrs = fz.inv_c
        else:
            self._solve_c = cho_solve_c((fz.cho_L, True))
            self._coarse_arrs = fz.cho_L
        self._step_jit = jax.jit(self._step_impl)

    # -- layout helpers ------------------------------------------------
    def shard(self, u):
        return self._own_u(jnp.asarray(u))

    def unshard(self, u_own):
        return to_natural(self.plan.u, u_own)

    # -- the step ------------------------------------------------------
    def __call__(self, u_own, p, step_idx):
        return self._step_jit(u_own, p, jnp.asarray(step_idx, jnp.int32))

    def _step_impl(self, u_own, p, step_idx):
        solver, cfg, plan = self.solver, self.solver.config, self.plan
        op = self.op_sh
        axis, n_dev = self.axis, self.n_dev
        dt = cfg.time.dt
        nu = solver.problem.nu
        fz = self.fz
        dtype = solver.dtype
        n_loc, d = plan.u.n_loc, solver.space.dim
        n_p = solver.space.n_pnodes
        precise = cfg.numerics.precise_dots

        t_new = (step_idx.astype(dtype) + 1.0) * dt
        # Dirichlet data: a global node-space evaluation (cheap, one per
        # step), then routed into the owned layout by the inverse-perm
        # gather.
        g_nat = solver._dirichlet_values(t_new, solver._dev)
        g_own = jnp.concatenate([g_nat, jnp.zeros((1, d), dtype)], 0)[
            self.iperm_u
        ]

        spec_v = P(axis)
        spec_st = P(axis)  # [n_dev, ...] stacked tables
        spec_r = P()  # replicated

        coarse = solver.op.coarse
        schur = solver.op.schur
        band = fz.band

        def local(u_loc, g_loc, mask_loc, invdiag_loc, upd_loc, p_full,
                  cu, cp_nat, send_u, tab_u, detJ, GKd, Jinv,
                  vals1, diag_inv, band_r, schur_r, coarse_r, coarse_f):
            cu = cu[0]
            cp_nat = cp_nat[0]
            send_u = [s[0] for s in send_u]
            tab_u = tab_u[0]
            mask2 = mask_loc[:, None]

            # ---- rhs + warm residual (one ext-gather, one dual reduce)
            hist = u_loc / dt
            u0 = jnp.where(mask2, g_loc, u_loc)
            w = u_loc  # BDF1 linearisation point
            stacked = jnp.concatenate([hist, u0, w], axis=1)
            st_ext = _gather_ext(plan.u, stacked, send_u, n_dev, axis)
            st_e = st_ext[cu]  # [E_d, nloc, 3d]
            h_e, u0_e, w_e = (
                st_e[..., :d], st_e[..., d:2 * d], st_e[..., 2 * d:]
            )
            p_e = p_full[cp_nat]  # replicated pressure: plain gather

            # convection tables at the quadrature points (cell-local)
            w_q = jnp.einsum("qi,eic->eqc", op.PHI_U, w_e)
            wtilde = jnp.einsum("ekd,eqd->eqk", Jinv, w_q)
            WG = jnp.einsum("qik,eqk->eqi", op.GRAD_U, wtilde)
            gref = jnp.einsum("qik,eic->eqkc", op.GRAD_U, w_e)
            divw = jnp.einsum("eqkc,ekc->eq", gref, Jinv)

            def conv_term(v_e):
                v_q = jnp.einsum("qi,eic->eqc", op.PHI_U, v_e)
                r = jnp.einsum("eqi,eic->eqc", WG, v_e)
                r = r + 0.5 * divw[:, :, None] * v_q
                return jnp.einsum(
                    "q,qi,eqc->eic", op.W, op.PHI_U, r
                ) * detJ[:, None, None]

            def K_term(v_e):
                y = jnp.einsum("ij,ejc->eic", op.MHAT, v_e) * (
                    detJ / dt
                )[:, None, None]
                return y + nu * jnp.einsum(
                    "ekl,klij,ejc->eic", GKd, op.AHAT, v_e
                )

            b_e = jnp.einsum("ij,ejc->eic", op.MHAT, h_e) * detJ[
                :, None, None
            ]
            b_e = b_e + jnp.einsum(
                "ekc,kij,ei->ejc", Jinv, op.BHAT, p_e
            ) * detJ[:, None, None]
            f_e = K_term(u0_e) + conv_term(u0_e)
            y_e = jnp.concatenate([b_e, b_e - f_e], axis=-1)
            y2 = _reduce_ext(
                plan.u, y_e.reshape(-1, 2 * d), tab_u, send_u, n_dev, axis
            )
            b_u, r0_u = y2[:, :d], y2[:, d:]
            rhs_u = jnp.where(mask2, g_loc, b_u)
            r0 = jnp.where(mask2, 0.0, r0_u).reshape(-1)

            # ---- 1. tentative velocity: FGMRES with psum'd reductions
            bnorm = _norm(rhs_u.reshape(-1), precise, axis)
            atol = jnp.maximum(cfg.solver.rtol * bnorm, cfg.solver.atol)

            def Fop(v):
                u = v.reshape(n_loc, d)
                u_ext = _gather_ext(plan.u, u, send_u, n_dev, axis)
                u_e = u_ext[cu]
                y_e = (K_term(u_e) + conv_term(u_e)).reshape(-1, d)
                y = _reduce_ext(plan.u, y_e, tab_u, send_u, n_dev, axis)
                return jnp.where(mask2, u, y).reshape(-1)

            minv = jnp.broadcast_to(
                invdiag_loc[:, None], (n_loc, d)
            ).reshape(-1)
            du, info_f = fgmres(
                Fop,
                r0,
                M=lambda v: minv * v,
                rtol=0.0,
                atol=atol,
                tol_mode="abs",
                restart=cfg.solver.restart,
                maxiter=cfg.solver.maxiter,
                precise=precise,
                axis_name=axis,
            )
            u_star = u0 + du.reshape(n_loc, d)

            # ---- 2. pressure Poisson on the REPLICATED pressure space
            us_ext = _gather_ext(plan.u, u_star, send_u, n_dev, axis)
            us_e = us_ext[cu]
            div_e = jnp.einsum(
                "ekc,kij,ejc->ei", Jinv, op.BHAT, us_e
            ) * detJ[:, None]
            rhs_part = jnp.zeros((n_p,), dtype).at[
                cp_nat.reshape(-1)
            ].add(div_e.reshape(-1))
            rhs_p = -jax.lax.psum(rhs_part, axis) / dt  # frozen: S~=dt*S1

            if band_r is not None:
                from navierstokes_project_nm4pde_tpu.ops.banded import (
                    banded_matvec,
                )

                S = lambda pv: banded_matvec(band_r, pv)  # noqa: E731
            else:
                S = lambda pv: schur_ell_matvec(schur_r, vals1, pv)  # noqa: E731

            solve_c = (
                inv_solve_c(coarse_f) if fz.inv_c is not None
                else cho_solve_c((coarse_f, True))
            )

            def M2(v):
                return twolevel_apply_additive_g(
                    coarse_r, solve_c, diag_inv, v
                )

            rp_norm = _norm(rhs_p, precise)
            s_atol = jnp.minimum(
                atol / dt, cfg.solver.proj_div_cap * rp_norm
            )
            phi, info_s = cg(
                S,
                rhs_p,
                M=M2,
                rtol=0.0,
                atol=s_atol,
                maxiter=cfg.solver.maxiter,
                precise=precise,
            )

            # ---- 3. update
            phi_e = phi[cp_nat]
            gphi_e = -jnp.einsum(
                "ekc,kij,ei->ejc", Jinv, op.BHAT, phi_e
            ) * detJ[:, None, None]
            gphi = _reduce_ext(
                plan.u, gphi_e.reshape(-1, d), tab_u, send_u, n_dev, axis
            )
            u_new = u_star - upd_loc[:, None] * gphi
            p_new = p_full + phi
            return u_new, p_new, info_f.iters, info_s.iters

        fn = jax.shard_map(
            local,
            mesh=self.dmesh,
            in_specs=(
                spec_v, spec_v, spec_v, spec_v, spec_v,  # u, g, mask, diag, upd
                spec_r,  # p (replicated)
                spec_st, spec_st,  # cells_u (ext-local), cells_p (natural)
                tuple(spec_st for _ in plan.u.send),
                spec_st,  # table_u
                spec_v, spec_v, spec_v,  # detJ, GKd, Jinv (cell blocks)
                spec_r, spec_r, spec_r, spec_r, spec_r, spec_r,
            ),
            out_specs=(spec_v, spec_r, spec_r, spec_r),
            check_vma=False,
        )
        return fn(
            u_own, g_own, self.mask_own, self.invdiag_own, self.upd_own, p,
            plan.u.cells_loc, self.cp_nat,
            tuple(plan.u.send), plan.u.table,
            op.detJ, op.GKd, op.Jinv,
            fz.vals1, self.inv_d, band, schur, coarse, self._coarse_arrs,
        )
