# KITTI-MOT 50 preset (capability parity with reference arguments/kitti-50.py)
split_mode = 'nvs-50'
num_cam = 2
object_extent = 5.0
min_camera_extent = 5.0
order_args = dict(
    # bspline(ctrl_pts, order), poly, fft, quat-spline(ctrl_pts, order)
    # order 2 per reference arguments/kitti-50.py:3-5 (half-density split)
    xyz=[None, 2, 0, 6, 0, 0],
    rotation=[0, 0, 0, 0, None, 2],
    shs=[0, 0, 0, 6, 0, 0],
    background=[None, 2, 0, 6, 0, 0],
)
