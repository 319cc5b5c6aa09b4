from gta_tpu.geometry.coords import (
    make_2dcoord,
    make_2dimgcoord,
    posenc_2d_grid,
    posenc_2d_coord,
    octave_posenc,
)
from gta_tpu.geometry.so2 import so2_angles, so2_rotors, make_so2_mats, apply_rotor, apply_rotor_inv
from gta_tpu.geometry.t2 import make_t2_mats, make_t2_mats_inv
from gta_tpu.geometry.se3 import (
    se3_inverse,
    scale_mask,
    homogenize,
    rigid_transform,
    rotate_z_mat,
)
from gta_tpu.geometry.wigner import wigner_d_matrices, rotmat_to_zyz_euler, z_rot_mat
from gta_tpu.geometry.rays import (
    camera_rays,
    camera_rays_from_extrinsic,
    lookat_extrinsic,
    transform_points,
    transform_dirs,
)
from gta_tpu.geometry.plucker import plucker_params, plucker_dist, plucker_posenc
from gta_tpu.geometry.frustum import normalized_intrinsics, frustum_pixel_points
