"""Minimal faithful filterpy.kalman.KalmanFilter (see package docstring)."""

import numpy as np


class KalmanFilter:
    def __init__(self, dim_x: int, dim_z: int, dim_u: int = 0):
        self.dim_x = dim_x
        self.dim_z = dim_z
        self.dim_u = dim_u
        self.x = np.zeros(dim_x)
        self.F = np.eye(dim_x)
        self.H = np.zeros((dim_z, dim_x))
        self.P = np.eye(dim_x)
        self.Q = np.eye(dim_x)
        self.R = np.eye(dim_z)
        self._I = np.eye(dim_x)

    def predict(self, u=None, B=None, F=None, Q=None):
        F = self.F if F is None else F
        Q = self.Q if Q is None else Q
        self.x = F @ self.x
        if u is not None and B is not None:
            self.x = self.x + B @ u
        self.P = F @ self.P @ F.T + Q

    def update(self, z, R=None, H=None):
        R = self.R if R is None else R
        H = self.H if H is None else H
        z = np.asarray(z, dtype=float)
        y = z - H @ self.x
        PHT = self.P @ H.T
        S = H @ PHT + R
        K = PHT @ np.linalg.inv(S)
        self.x = self.x + K @ y
        # Joseph form (filterpy's update), numerically symmetric-positive.
        I_KH = self._I - K @ H
        self.P = I_KH @ self.P @ I_KH.T + K @ R @ K.T
