"""Independent NumPy port of the reference CUDA MPPI pipeline.

This is the golden model for parity tests: a deliberately *literal*,
loop-by-loop transcription of the reference kernels' semantics
(``mppi_controller.cu``, ``costs.cu``, ``neural_net_model.cu``,
``car_bfs.cuh``) in float32 NumPy, structured like the CUDA code (per
rollout, per timestep) rather than like the JAX solver — so agreement
between the two is meaningful evidence of semantic parity.

Noise is injected explicitly (shape (K, T, C), standard normal) since
cuRAND streams cannot be reproduced bit-exactly.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


# ---------------------------------------------------------------------------
# dynamics models (host-side mirrors: neural_net_model.cu:192-230)
# ---------------------------------------------------------------------------

class RefNNModel:
    """6-32-32-4 tanh MLP + kinematics, reference layout (W: (out, in))."""

    def __init__(self, weights, biases, control_rngs, dt, negate_yaw_der=True):
        self.weights = [np.asarray(W, dtype=F32) for W in weights]
        self.biases = [np.asarray(b, dtype=F32).reshape(-1) for b in biases]
        self.control_rngs = np.asarray(control_rngs, dtype=F32)  # (C, 2)
        self.dt = F32(dt)
        self.negate_yaw_der = negate_yaw_der

    @classmethod
    def from_npz(cls, path, control_rngs, dt, negate_yaw_der=True):
        d = np.load(path)
        weights, biases = [], []
        i = 1
        while f"dynamics_W{i}" in d:
            weights.append(d[f"dynamics_W{i}"].astype(F32))
            biases.append(d[f"dynamics_b{i}"].astype(F32))
            i += 1
        return cls(weights, biases, control_rngs, dt, negate_yaw_der)

    def enforce_constraints(self, u):
        return np.clip(u, self.control_rngs[:, 0], self.control_rngs[:, 1])

    def state_deriv(self, s, u):
        der = np.zeros(7, dtype=F32)
        der[0] = np.cos(s[2]) * s[4] - np.sin(s[2]) * s[5]
        der[1] = np.sin(s[2]) * s[4] + np.cos(s[2]) * s[5]
        der[2] = -s[6] if self.negate_yaw_der else s[6]
        acts = np.concatenate([s[3:7], u]).astype(F32)
        n = len(self.weights)
        for i, (W, b) in enumerate(zip(self.weights, self.biases)):
            acts = W @ acts + b
            if i < n - 1:
                acts = np.tanh(acts)
        der[3:7] = acts
        return der


class RefBFModel:
    """Generalized-linear model with the 25 car basis functions
    (car_bfs.cuh:44-121, generalized_linear.cu)."""

    def __init__(self, theta, control_rngs, dt):
        self.theta = np.asarray(theta, dtype=F32)  # (4, 25)
        self.control_rngs = np.asarray(control_rngs, dtype=F32)
        self.dt = F32(dt)

    @classmethod
    def from_npz(cls, path, control_rngs, dt):
        d = np.load(path)
        return cls(d["W"].astype(F32), control_rngs, dt)

    def enforce_constraints(self, u):
        return np.clip(u, self.control_rngs[:, 0], self.control_rngs[:, 1])

    def _basis(self, s, u):
        phi = np.zeros(25, dtype=F32)
        moving = s[4] > 0.1
        if moving:
            front = np.arctan(s[5] / s[4] + 0.45 * s[6] / s[4]) - u[0]
        else:
            front = -u[0]
        tf = np.tan(front)
        sin_st = np.sin(u[0])
        phi[0] = u[1]
        phi[1] = s[4] / 10.0
        phi[2] = sin_st * tf / 1200.0
        phi[3] = sin_st * tf * abs(tf) / 1440000.0
        phi[4] = sin_st * tf ** 3 / 1728000000.0
        phi[5] = s[6] * s[5] / 25.0
        phi[6] = s[6] / 10.0
        phi[7] = s[5] / 10.0
        phi[8] = sin_st
        phi[9] = s[5] / s[4] / 40.0 if moving else 0.0
        phi[10] = tf / 1400.0
        phi[11] = tf * abs(tf) / 1960000.0
        phi[12] = tf ** 3 / 2744000000.0
        if moving:
            r13 = s[5] / s[4] - 0.35 * s[6] / s[4]
            phi[13] = r13 / 40.0
            phi[14] = r13 * abs(r13) / 1600.0
            phi[15] = r13 ** 3 / 64000.0
        phi[16] = s[6] * s[4] / 50.0
        phi[17] = s[3]
        phi[18] = s[3] * s[6]
        phi[19] = s[3] * s[4] / 3.0
        phi[20] = s[3] * s[4] * s[6] / 5.0
        phi[21] = s[4] ** 2 / 100.0
        phi[22] = s[4] ** 3 / 1000.0
        phi[23] = u[1] ** 2
        phi[24] = u[1] ** 3
        return phi

    def state_deriv(self, s, u):
        der = np.zeros(7, dtype=F32)
        der[0] = np.cos(s[2]) * s[4] - np.sin(s[2]) * s[5]
        der[1] = np.sin(s[2]) * s[4] + np.cos(s[2]) * s[5]
        der[2] = -s[6]
        der[3:7] = self.theta @ self._basis(s, u)
        return der


# ---------------------------------------------------------------------------
# costs (costs.cu:301-414)
# ---------------------------------------------------------------------------

class RefCosts:
    FRONT_D = 0.5
    BACK_D = -0.5

    def __init__(self, costmap, r_c1, r_c2, trs, params, l1_cost=False):
        self.costmap = np.asarray(costmap, dtype=F32)  # (H, W, 4)
        self.r_c1, self.r_c2, self.trs = r_c1, r_c2, trs
        self.p = params  # dict of cost params
        self.l1_cost = l1_cost

    def _tex2d(self, u, v):
        H, W = self.costmap.shape[:2]
        if np.isnan(u):
            u = 0.0
        if np.isnan(v):
            v = 0.0
        ix = int(np.clip(np.floor(u * W), 0, W - 1))
        iy = int(np.clip(np.floor(v * H), 0, H - 1))
        return self.costmap[iy, ix]

    def _transform(self, x, y):
        u = self.r_c1[0] * x + self.r_c2[0] * y + self.trs[0]
        v = self.r_c1[1] * x + self.r_c2[1] * y + self.trs[1]
        w = self.r_c1[2] * x + self.r_c2[2] * y + self.trs[2]
        return u / w, v / w

    def get_control_cost(self, u, du, nu):
        p = self.p
        return (p["steering_coeff"] * du[0] * (u[0] - du[0]) / (nu[0] * nu[0])
                + p["throttle_coeff"] * du[1] * (u[1] - du[1]) / (nu[1] * nu[1]))

    def get_speed_cost(self, s):
        err = s[4] - self.p["desired_speed"]
        cost = abs(err) if self.l1_cost else err * err
        return self.p["speed_coeff"] * cost

    def get_track_cost(self, s, crash):
        p = self.p
        xf = s[0] + self.FRONT_D * np.cos(s[2])
        yf = s[1] + self.FRONT_D * np.sin(s[2])
        xb = s[0] + self.BACK_D * np.cos(s[2])
        yb = s[1] + self.BACK_D * np.sin(s[2])
        u, v = self._transform(xf, yf)
        front = self._tex2d(u, v)[0]
        u, v = self._transform(xb, yb)
        back = self._tex2d(u, v)[0]
        track = (abs(front) + abs(back)) / 2.0
        if abs(track) < p["track_slop"]:
            track = 0.0
        else:
            track = p["track_coeff"] * track
        if front >= p["boundary_threshold"] or back >= p["boundary_threshold"]:
            crash[0] = 1
        return track

    def get_stabilizing_cost(self, s):
        p = self.p
        cost = 0.0
        if abs(s[4]) > 0.001:
            slip = -np.arctan(s[5] / abs(s[4]))
            cost = p["slip_penalty"] * slip ** 2
            if abs(slip) > p["max_slip_ang"]:
                cost += p["crash_coeff"]
        return cost

    def get_crash_cost(self, crash):
        return self.p["crash_coeff"] if crash[0] > 0 else 0.0

    def compute_cost(self, s, u, du, nu, crash):
        control = self.get_control_cost(u, du, nu)
        track = self.get_track_cost(s, crash)  # may set crash
        speed = self.get_speed_cost(s)
        crash_c = (1.0 - self.p["discount"]) * self.get_crash_cost(crash)
        stab = self.get_stabilizing_cost(s)
        cost = control + speed + crash_c + track + stab
        if cost > 1e12 or np.isnan(cost):
            cost = 1e12
        return F32(cost)

    def get_crash(self, s, crash):
        if abs(s[3]) > 1.57:
            crash[0] = 1

    def terminal_cost(self, s):
        return 0.0


# ---------------------------------------------------------------------------
# the solve (mppi_controller.cu:72-184, 600-675)
# ---------------------------------------------------------------------------

def rollout_kernel(num_timesteps, state, U, noise, nu, model, costs,
                   opt_delay, num_rollouts):
    """Literal port of rolloutKernel.  ``noise``: (K, T, C) N(0,1) draws.
    Returns (costs (K,), du_d (K, T, C) perturbed controls pre-clamp)."""
    K, T, C = num_rollouts, num_timesteps, 2
    du_d = noise.astype(F32).copy()
    traj_costs = np.zeros(K, dtype=F32)
    for k in range(K):
        s = state.astype(F32).copy()
        crash = [0]
        running_cost = F32(0.0)
        for t in range(T):
            u = np.zeros(C, dtype=F32)
            du = np.zeros(C, dtype=F32)
            for j in range(C):
                if k == 0 or t < opt_delay:
                    du[j] = 0.0
                    u[j] = U[t, j]
                elif k >= 0.99 * K:
                    du[j] = du_d[k, t, j] * nu[j]
                    u[j] = du[j]
                else:
                    du[j] = du_d[k, t, j] * nu[j]
                    u[j] = U[t, j] + du[j]
                du_d[k, t, j] = u[j]
            u = model.enforce_constraints(u)
            if t > 0 and crash[0] > -1:
                c = costs.compute_cost(s, u, du, nu, crash)
                running_cost = running_cost + (c - running_cost) / F32(t)
            s = s + model.state_deriv(s, u) * model.dt
            costs.get_crash(s, crash)
        traj_costs[k] = running_cost + costs.terminal_cost(s)
    return traj_costs, du_d


def compute_control(state, U, noise, nu, model, costs, gamma, opt_delay,
                    control_hist):
    """One full solve iteration + SG smoothing + nominal trajectory
    (computeControl, mppi_controller.cu:600-675).  Returns dict."""
    K, T, C = noise.shape
    traj_costs, du_d = rollout_kernel(T, state, U, noise, nu, model, costs,
                                      opt_delay, K)
    baseline = traj_costs.min()
    w = np.exp(-gamma * (traj_costs - baseline)).astype(F32)
    normalizer = w.sum()
    trajectory_cost = float((w * w / normalizer).sum())
    U_new = np.einsum("k,ktc->tc", w / normalizer, du_d).astype(F32)

    # savitskyGolay (mppi_controller.cu:469-499)
    filt = np.array([-3, 12, 17, 12, -3], dtype=F32) / F32(35.0)
    padded = np.concatenate(
        [control_hist, U_new, np.tile(U_new[-1:], (2, 1))], axis=0)
    U_smooth = np.stack(
        [filt @ padded[i:i + 5] for i in range(T)]).astype(F32)

    # computeNominalTraj (mppi_controller.cu:501-519)
    s = state.astype(F32).copy()
    state_sol = np.zeros((T, 7), dtype=F32)
    control_sol = np.zeros((T, C), dtype=F32)
    for t in range(T):
        state_sol[t] = s
        u = model.enforce_constraints(U_smooth[t].copy())
        s = s + model.state_deriv(s, u) * model.dt
        control_sol[t] = u

    return dict(U=U_smooth, baseline=baseline, normalizer=normalizer,
                trajectory_cost=trajectory_cost, weights=w,
                traj_costs=traj_costs, du_d=du_d,
                state_solution=state_sol, control_solution=control_sol)


def slide_control_seq(U, control_hist, stride, init_u):
    """slideControlSeq (mppi_controller.cu:527-554)."""
    T, C = U.shape
    U_flat = U.reshape(-1)
    hist = control_hist.reshape(-1).copy()
    if stride == 1:
        hist = np.array([hist[2], hist[3], U_flat[0], U_flat[1]], dtype=F32)
    elif stride >= 2:
        t = stride - 2
        hist = U_flat[t:t + 4].copy()
    U_new = U.copy()
    U_new[:T - stride] = U[stride:]
    U_new[T - stride:] = init_u
    return U_new, hist.reshape(2, C)
