"""Downstream applications: the reference's two benchmark families.

* :mod:`dhts.apps.inverse` — inverse initial-state estimation on macro /
  micro / hybrid scenes, solved by simulator gradients (Adam) vs CMA-ES /
  Nelder-Mead / SLSQP baselines.
* :mod:`dhts.apps.control` — intersection signal control (ITSCP): an MLP
  controller trained by backprop through the differentiable rollout.
"""
