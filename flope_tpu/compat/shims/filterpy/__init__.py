"""Shim for `filterpy` (not installed in this environment).

Provides filterpy.kalman.KalmanFilter — the exact subset the reference uses
(flower_model.py:18-26, kalman_filter.py:77-85): dim_x=dim_z linear KF with
settable x/F/H/P/Q/R, predict() and update(z). Equations follow filterpy's
documented implementation (Joseph-form covariance update), which for the
reference's F=H=I, diagonal P/Q/R parameters is algebraically identical to
the textbook form.
"""
