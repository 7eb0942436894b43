"""UniPC predictor-corrector for rectified flow, TPU-first.

Behavioural parity target: reference `videox_fun/utils/fm_solvers_unipc.py`
(predict_x0 path, solver_type "bh2", solver_order 2, lower_order_final True,
final_sigmas_type "zero"). The key design change for TPU: every scalar that
the reference derives with tensor ops inside the step (lambda/h/B_h/rho solves,
`fm_solvers_unipc.py:405-462,548-607`) depends only on the sigma grid, so we
precompute the whole per-step coefficient *plan* in float64 numpy at
``set_timesteps`` time. The device-side ``step`` is then a handful of fused
multiply-adds over the sample and at most two cached model outputs — it jits
cleanly and can be folded into a `lax.scan` (see ``plan_arrays``).

State is explicit and functional: ``step`` takes and returns a ``UniPCState``
pytree, so the denoise loop carries it through jit with no Python mutation.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import flow_shift_sigmas, lam


class UniPCState(NamedTuple):
    """Loop-carried sampler state (all entries latent-shaped)."""
    m0: jax.Array          # newest converted model output (x0 prediction)
    m1: jax.Array          # second newest
    m2: jax.Array          # third newest (order-3 only; zeros otherwise)
    last_sample: jax.Array # sample before the last predictor update


@dataclasses.dataclass(frozen=True)
class _StepPlan:
    # corrector (applied to the incoming sample of this step)
    use_corrector: bool
    c_ratio: float = 0.0     # sigma_t / sigma_s0
    c_m0: float = 0.0        # coefficient on m0 (= -alpha_t * h_phi_1)
    c_d1s: float = 0.0       # coefficient on (m1 - m0)/r0 term
    c_d2s: float = 0.0       # coefficient on (m2 - m0)/r1 term (order 3)
    c_d1t: float = 0.0       # coefficient on (model_t - m0)
    c_r0inv: float = 0.0     # 1/r0 for the D1s term
    c_r1inv: float = 0.0     # 1/r1 for the D2s term
    # predictor
    p_order: int = 1
    p_ratio: float = 0.0
    p_m0: float = 0.0
    p_d1: float = 0.0        # coefficient on (m1 - m0)/r0
    p_d2: float = 0.0        # coefficient on (m2 - m0)/r1 (order 3)
    p_r0inv: float = 0.0
    p_r1inv: float = 0.0


class FlowUniPCScheduler:
    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        solver_order: int = 2,
        shift: float = 1.0,
        solver_type: str = "bh2",
        lower_order_final: bool = True,
        disable_corrector: Sequence[int] = (),
        prediction_type: str = "flow_prediction",
    ):
        assert solver_type in ("bh1", "bh2")
        assert prediction_type == "flow_prediction"
        assert solver_order in (1, 2, 3), solver_order
        self.num_train_timesteps = num_train_timesteps
        self.solver_order = solver_order
        self.default_shift = shift
        self.solver_type = solver_type
        self.lower_order_final = lower_order_final
        self.disable_corrector = set(disable_corrector)
        self.sigmas: Optional[np.ndarray] = None
        self.timesteps: Optional[np.ndarray] = None
        self.plans: List[_StepPlan] = []

    # ------------------------------------------------------------------ setup
    def set_timesteps(self, num_inference_steps: int,
                      shift: Optional[float] = None,
                      mu: Optional[float] = None) -> np.ndarray:
        shift = self.default_shift if shift is None else shift
        self.sigmas, self.timesteps = flow_shift_sigmas(
            num_inference_steps, shift, self.num_train_timesteps, mu=mu)
        self.num_inference_steps = num_inference_steps
        self.plans = self._build_plans()
        return self.timesteps

    def _bh(self, hh: float) -> float:
        return hh if self.solver_type == "bh1" else float(np.expm1(hh))

    def _rb_system(self, rks: np.ndarray, hh: float, B_h: float, order: int):
        """The UniPC Vandermonde system R rho = b (reference
        `fm_solvers_unipc.py:443-456` / `:578-598`), shared by predictor
        and corrector; rks carries the trailing 1.0 like the reference."""
        h_phi_1 = float(np.expm1(hh))
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1.0
        fact = 1
        for k in range(1, order + 1):
            R.append(rks ** (k - 1))
            b.append(h_phi_k * fact / B_h)
            fact *= k + 1
            h_phi_k = h_phi_k / hh - 1.0 / fact
        return np.stack(R), np.array(b)

    def _build_plans(self) -> List[_StepPlan]:
        s = self.sigmas
        N = self.num_inference_steps
        plans: List[_StepPlan] = []
        p_orders: List[int] = []
        with np.errstate(divide="ignore", invalid="ignore"):
            for i in range(N):
                # ---------------- corrector on the sample entering step i
                # (UniC over the predictor of step i-1; its history indices
                # run s[i-1-k] — reference `fm_solvers_unipc.py:559-570`)
                use_c = i > 0 and (i - 1) not in self.disable_corrector
                ckw = {}
                if use_c:
                    order_c = p_orders[i - 1]
                    sig_t, sig_s0 = s[i], s[i - 1]
                    a_t = 1.0 - sig_t
                    h = lam(sig_t) - lam(sig_s0)
                    hh = -h
                    h_phi_1 = float(np.expm1(hh))
                    B_h = self._bh(hh)
                    rks = np.array(
                        [(lam(s[i - 1 - k]) - lam(sig_s0)) / h
                         for k in range(1, order_c)] + [1.0])
                    c_d1s = c_d2s = r0inv = r1inv = 0.0
                    if order_c == 1:
                        c_d1t = -a_t * B_h * 0.5
                    else:
                        R, b = self._rb_system(rks, hh, B_h, order_c)
                        rhos = np.linalg.solve(R, b)
                        c_d1s = -a_t * B_h * rhos[0]
                        r0inv = 1.0 / rks[0]
                        if order_c >= 3:
                            c_d2s = -a_t * B_h * rhos[1]
                            r1inv = 1.0 / rks[1]
                        c_d1t = -a_t * B_h * rhos[-1]
                    ckw = dict(
                        c_ratio=float(sig_t / sig_s0),
                        c_m0=float(-a_t * h_phi_1),
                        c_d1s=float(c_d1s), c_d2s=float(c_d2s),
                        c_d1t=float(c_d1t),
                        c_r0inv=float(r0inv), c_r1inv=float(r1inv),
                    )

                # ---------------- predictor i -> i+1
                if self.lower_order_final:
                    this_order = min(self.solver_order, N - i)
                else:
                    this_order = self.solver_order
                this_order = min(this_order, min(i, self.solver_order) + 1)
                p_orders.append(this_order)

                sig_t, sig_s0 = s[i + 1], s[i]
                a_t = 1.0 - sig_t
                if sig_t == 0.0:
                    # final step: x_{t} = x0 prediction exactly
                    pkw = dict(p_order=1, p_ratio=0.0, p_m0=1.0)
                else:
                    h = lam(sig_t) - lam(sig_s0)
                    hh = -h
                    h_phi_1 = float(np.expm1(hh))
                    B_h = self._bh(hh)
                    pkw = dict(p_order=this_order,
                               p_ratio=float(sig_t / sig_s0),
                               p_m0=float(-a_t * h_phi_1))
                    if this_order >= 2:
                        rks = np.array(
                            [(lam(s[i - k]) - lam(sig_s0)) / h
                             for k in range(1, this_order)] + [1.0])
                        if this_order == 2:
                            rhos = np.array([0.5])
                        else:
                            R, b = self._rb_system(rks, hh, B_h, this_order)
                            rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
                        pkw.update(p_d1=float(-a_t * B_h * rhos[0]),
                                   p_r0inv=float(1.0 / rks[0]))
                        if this_order >= 3:
                            pkw.update(p_d2=float(-a_t * B_h * rhos[1]),
                                       p_r1inv=float(1.0 / rks[1]))

                plans.append(_StepPlan(use_corrector=use_c, **ckw, **pkw))
        return plans

    # ------------------------------------------------------------------- step
    def init_state(self, latents: jax.Array) -> UniPCState:
        z = jnp.zeros_like(latents)
        return UniPCState(m0=z, m1=z, m2=z, last_sample=z)

    def convert_model_output(self, model_output: jax.Array, step_index: int,
                             sample: jax.Array) -> jax.Array:
        """flow_prediction, predict_x0: x0 = sample - sigma_t * v
        (reference `fm_solvers_unipc.py:318-331`)."""
        sigma_t = float(self.sigmas[step_index])
        return sample - sigma_t * model_output

    def step(self, model_output: jax.Array, step_index: int,
             sample: jax.Array, state: UniPCState
             ) -> Tuple[jax.Array, UniPCState]:
        """One UniC (corrector) + UniP (predictor) update. ``step_index`` must
        be a Python int (the plan is static); tensors may be traced."""
        plan = self.plans[step_index]
        model_t = self.convert_model_output(model_output, step_index, sample)

        if plan.use_corrector:
            d1t = model_t - state.m0
            x = (plan.c_ratio * state.last_sample
                 + plan.c_m0 * state.m0
                 + plan.c_d1t * d1t)
            if plan.c_d1s != 0.0:
                x = x + plan.c_d1s * ((state.m1 - state.m0) * plan.c_r0inv)
            if plan.c_d2s != 0.0:
                x = x + plan.c_d2s * ((state.m2 - state.m0) * plan.c_r1inv)
            sample = x.astype(sample.dtype)

        # shift history
        m2, m1, m0 = state.m1, state.m0, model_t

        x = plan.p_ratio * sample + plan.p_m0 * m0
        if plan.p_order >= 2:
            x = x + plan.p_d1 * ((m1 - m0) * plan.p_r0inv)
        if plan.p_order >= 3:
            x = x + plan.p_d2 * ((m2 - m0) * plan.p_r1inv)
        prev_sample = x.astype(sample.dtype)

        return prev_sample, UniPCState(m0=m0, m1=m1, m2=m2,
                                       last_sample=sample)

    # ---------------------------------------------------------------- training
    def add_noise(self, original: jax.Array, noise: jax.Array,
                  sigma) -> jax.Array:
        return (1.0 - sigma) * original + sigma * noise

    # ------------------------------------------------------------- scan export
    def plan_arrays(self) -> dict:
        """Stacked per-step coefficients for a fully-jitted `lax.scan` denoise
        loop (each entry shape [num_steps])."""
        f = lambda name: np.array([getattr(p, name) for p in self.plans],
                                  dtype=np.float32)
        return {
            "sigma": self.sigmas[:-1].astype(np.float32),
            "timestep": self.timesteps.astype(np.float32),
            "use_corrector": np.array(
                [p.use_corrector for p in self.plans], dtype=np.bool_),
            "c_ratio": f("c_ratio"), "c_m0": f("c_m0"), "c_d1s": f("c_d1s"),
            "c_d2s": f("c_d2s"), "c_d1t": f("c_d1t"),
            "c_r0inv": f("c_r0inv"), "c_r1inv": f("c_r1inv"),
            "p_order2": np.array(
                [p.p_order >= 2 for p in self.plans], dtype=np.bool_),
            "p_ratio": f("p_ratio"), "p_m0": f("p_m0"), "p_d1": f("p_d1"),
            "p_d2": f("p_d2"), "p_r0inv": f("p_r0inv"),
            "p_r1inv": f("p_r1inv"),
        }
