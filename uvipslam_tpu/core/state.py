"""NavState: the 15-dof inertial navigation state as a JAX pytree.

TPU-native equivalent of the reference NavState
(reference: src/IMU/NavState.h:16-83, src/IMU/NavState.cpp): position P,
velocity V, rotation R (body->world, stored as a 3x3 matrix), gyro/acc
biases and their *delta* corrections (the Forster RSS'15 split the
optimizer exploits: the preintegration is linearized around (bg, ba) and
the solve updates (dbg, dba)).

Being a registered dataclass, NavState batches transparently: a table of
N states is just a NavState whose leaves have a leading N dimension.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from uvipslam_tpu.core import lie


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NavState:
    p: jax.Array    # [..., 3]    position, world
    v: jax.Array    # [..., 3]    velocity, world
    R: jax.Array    # [..., 3, 3] body->world rotation
    bg: jax.Array   # [..., 3]    gyro bias (linearization point)
    ba: jax.Array   # [..., 3]    acc bias (linearization point)
    dbg: jax.Array  # [..., 3]    delta gyro bias (optimized correction)
    dba: jax.Array  # [..., 3]    delta acc bias (optimized correction)

    @staticmethod
    def identity(batch_shape: tuple = (), dtype=jnp.float32) -> "NavState":
        z3 = jnp.zeros(batch_shape + (3,), dtype)
        return NavState(
            p=z3, v=z3,
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
            bg=z3, ba=z3, dbg=z3, dba=z3,
        )

    # -- manifold retractions (reference: src/IMU/NavState.h:45-48) --------

    def inc_small_pvr(self, upd9: jax.Array) -> "NavState":
        """Retraction of a 9-dof update [dP, dV, dPhi]:
        P <- P + R*dP ; V <- V + dV ; R <- R*Exp(dPhi)
        (Forster RSS'15 convention, matching the reference g2o vertex
        oplus, src/IMU/g2otypes.h VertexNavStatePVR::oplusImpl)."""
        dp, dv, dphi = upd9[..., 0:3], upd9[..., 3:6], upd9[..., 6:9]
        return dataclasses.replace(
            self,
            p=self.p + lie.mv(self.R, dp),
            v=self.v + dv,
            # renormalized: repeated f32 retractions otherwise decay R
            R=lie.normalize_rotation(lie.mm(self.R, lie.so3_exp(dphi))),
        )

    def inc_small_bias(self, upd6: jax.Array) -> "NavState":
        """Retraction of a 6-dof bias update [d(dbg), d(dba)]."""
        return dataclasses.replace(
            self,
            dbg=self.dbg + upd6[..., 0:3],
            dba=self.dba + upd6[..., 3:6],
        )

    # -- convenience --------------------------------------------------------

    @property
    def bg_total(self) -> jax.Array:
        return self.bg + self.dbg

    @property
    def ba_total(self) -> jax.Array:
        return self.ba + self.dba

    def normalized(self) -> "NavState":
        return dataclasses.replace(self, R=lie.normalize_rotation(self.R))
