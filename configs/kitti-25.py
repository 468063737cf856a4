# KITTI-MOT 25 preset (capability parity with reference arguments/kitti-25.py)
split_mode = 'nvs-25'
num_cam = 2
object_extent = 5.0
min_camera_extent = 5.0
order_args = dict(
    # bspline(ctrl_pts, order), poly, fft, quat-spline(ctrl_pts, order)
    # low spline orders: the 25% split has sparse temporal supervision
    # (reference arguments/kitti-25.py:4-6 uses order 1 everywhere)
    xyz=[None, 1, 0, 6, 0, 0],
    rotation=[0, 0, 0, 0, None, 1],
    shs=[0, 0, 0, 6, 0, 0],
    background=[None, 1, 0, 6, 0, 0],
)
