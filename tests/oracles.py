"""Scalar NumPy oracles for the physics kernels, used only by tests.

These are independent, straightforward scalar implementations of the
published model equations (ARZ exact Riemann construction and IDM), written
to match the observable behavior of the reference simulator
(SonSang/diff-hybrid-traffic-sim: ``model/macro/_arz.py``,
``model/micro/_idm.py``) so the vectorized TPU kernels in ``dhts.ops`` can be
checked case by case against plain float math.
"""

import math

GAMMA = 0.5
EPS = 1e-5


def u_eq(r, u_max):
    return u_max * (1.0 - (max(r, 0.0) + EPS) ** GAMMA)


def u_eq_prime(r, u_max):
    return -u_max * GAMMA * max(r, EPS) ** (GAMMA - 1.0)


def u_of(r, y, u_max):
    rr = max(r, EPS)
    return y / rr + u_eq(rr, u_max)


def y_of(r, u, u_max):
    return r * (u - u_eq(r, u_max))


def lam0(r, u, u_max):
    return u + r * u_eq_prime(r, u_max)


def middle_state(r_l, u_l, u_r, u_max):
    """Rankine-Hugoniot / rarefaction-invariant middle state (r_m, u_m)."""
    base = r_l ** GAMMA + (u_l - u_r) / u_max
    r_m = base ** (1.0 / GAMMA) if base > 0 else 0.0
    return r_m, u_r


def rarefaction_state(r_l, u_l, u_max):
    """Centered (sonic) rarefaction state (r_c, u_c)."""
    r_c = ((u_l + u_max * r_l ** GAMMA) / ((GAMMA + 1.0) * u_max)) ** (1.0 / GAMMA)
    u_c = (GAMMA / (GAMMA + 1.0)) * (u_l + u_max * r_l ** GAMMA)
    return r_c, u_c


def riemann(r_l, y_l, r_r, y_r, u_max):
    """Scalar exact ARZ Riemann solve. Returns dict with interface state.

    Case enumeration and priorities follow the reference solver
    (``model/macro/_arz.py:212-332``): left vacuum, right vacuum, equal
    speeds, shock (u_l > u_r), rarefaction with middle state, vacuum
    rarefaction.
    """
    u_l = u_of(r_l, y_l, u_max)
    u_r = u_of(r_r, y_r, u_max)

    if r_l < EPS:
        case, s0, s1 = 0, 0.0, u_l
    elif r_r < EPS:
        u_vac = u_max + u_l - u_eq(r_l, u_max)
        l0 = lam0(r_l, u_l, u_max)
        s0 = s1 = 0.5 * (l0 + u_vac)
        case = 0 if l0 >= 0.0 else 2
    elif abs(u_l - u_r) < EPS:
        case, s0, s1 = 0, 0.0, u_r
    elif u_l > u_r:
        r_m, u_m = middle_state(r_l, u_l, u_r, u_max)
        s0 = (r_m * u_m - r_l * u_l) / max(r_m - r_l, EPS)
        s1 = u_r
        case = 0 if s0 >= 0.0 else 1
    elif u_max + u_l - u_eq(r_l, u_max) > u_r:
        r_m, u_m = middle_state(r_l, u_l, u_r, u_max)
        l0l = lam0(r_l, u_l, u_max)
        l0m = lam0(r_m, u_m, u_max)
        s0 = 0.5 * (l0l + l0m)
        s1 = u_r
        case = 0 if l0l >= 0 else (1 if l0m <= 0 else 2)
    else:
        u_vac = u_max + u_l - u_eq(r_l, u_max)
        l0 = lam0(r_l, u_l, u_max)
        s0 = 0.5 * (l0 + u_vac)
        s1 = u_r
        case = 0 if l0 >= 0.0 else 2

    if case == 0:
        r0, y0 = r_l, y_l
        u0 = u_of(r0, y0, u_max)
    elif case == 1:
        r0, u0 = middle_state(r_l, u_l, u_r, u_max)
        y0 = y_of(r0, u0, u_max)
    else:
        r0, u0 = rarefaction_state(r_l, u_l, u_max)
        y0 = y_of(r0, u0, u_max)

    return dict(r0=r0, y0=y0, u0=u0, speed0=s0, speed1=s1, case=case)


def godunov_lane_step(r, y, left_ru, right_ru, u_max, dt, dx):
    """Scalar Godunov update of one lane: lists in, lists out."""
    C = len(r)
    lr, lu = left_ru
    rr_, ru_ = right_ru
    states = ([(lr, y_of(lr, lu, u_max))] + list(zip(r, y)) +
              [(rr_, y_of(rr_, ru_, u_max))])
    fluxes = []
    for i in range(C + 1):
        (rl, yl), (rq, yq) = states[i], states[i + 1]
        sol = riemann(rl, yl, rq, yq, u_max)
        fluxes.append((sol["r0"] * sol["u0"], sol["y0"] * sol["u0"]))
    new_r, new_y = [], []
    for i in range(C):
        new_r.append(r[i] + (fluxes[i][0] - fluxes[i + 1][0]) * dt / dx)
        new_y.append(y[i] + (fluxes[i][1] - fluxes[i + 1][1]) * dt / dx)
    return new_r, new_y


def idm_acc(a_max, a_pref, v, v0, dp, dv, s0, T, dt):
    """Scalar IDM with both reference clamps (``model/micro/_idm.py:5-50``)."""
    s_star = s0 + v * T + v * dv / (2.0 * math.sqrt(a_max * a_pref))
    s_star = max(s_star, 0.0)
    acc = a_max * (1.0 - (v / v0) ** 4 - (s_star / dp) ** 2)
    return max(acc, -v / dt)
