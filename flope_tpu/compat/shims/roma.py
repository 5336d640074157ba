"""Shim for the `roma` rotation library (not installed in this environment).

Implements the exact subset the reference uses:
- special_procrustes (conversion.py:58): special orthogonal Procrustes —
  the SO(3) projection of a 3x3 matrix via SVD with determinant correction,
  which is roma's documented algorithm (and the unique nearest rotation for
  non-degenerate inputs, so any correct implementation agrees numerically).
- rotmat_to_unitquat / unitquat_to_rotmat (train_posenet.py:134): xyzw
  convention like roma/scipy.
"""

import numpy as np
import torch


def special_procrustes(M: torch.Tensor) -> torch.Tensor:
    """Nearest rotation matrix to each (..., 3, 3) input (Frobenius norm)."""
    U, _, Vh = torch.linalg.svd(M)
    det = torch.det(U @ Vh)
    d = torch.ones(M.shape[:-2] + (3,), dtype=M.dtype, device=M.device)
    d = d.clone()
    d[..., -1] = det
    return (U * d.unsqueeze(-2)) @ Vh


def rotmat_to_unitquat(R: torch.Tensor) -> torch.Tensor:
    """(..., 3, 3) -> (..., 4) xyzw unit quaternions (scipy convention)."""
    from scipy.spatial.transform import Rotation as sciR

    arr = R.detach().cpu().numpy().reshape(-1, 3, 3)
    q = sciR.from_matrix(arr).as_quat()  # xyzw
    return torch.as_tensor(q.reshape(R.shape[:-2] + (4,)),
                           dtype=R.dtype, device=R.device)


def unitquat_to_rotmat(q: torch.Tensor) -> torch.Tensor:
    """(..., 4) xyzw -> (..., 3, 3)."""
    from scipy.spatial.transform import Rotation as sciR

    arr = q.detach().cpu().numpy().reshape(-1, 4)
    R = sciR.from_quat(arr).as_matrix()
    return torch.as_tensor(R.reshape(q.shape[:-1] + (3, 3)),
                           dtype=q.dtype, device=q.device)


def quat_product(p: torch.Tensor, q: torch.Tensor) -> torch.Tensor:
    """Hamilton product of xyzw quaternions."""
    px, py, pz, pw = p.unbind(-1)
    qx, qy, qz, qw = q.unbind(-1)
    return torch.stack([
        pw * qx + px * qw + py * qz - pz * qy,
        pw * qy - px * qz + py * qw + pz * qx,
        pw * qz + px * qy - py * qx + pz * qw,
        pw * qw - px * qx - py * qy - pz * qz,
    ], dim=-1)
