# nuScenes preset (capability parity with reference arguments/nuscenes.py)
num_cam = 3
order_args = dict(
    xyz=[None, 5, 0, 6, 0, 0],
    rotation=[0, 0, 0, 0, None, 5],
    shs=[0, 0, 0, 6, 0, 0],
    background=[None, 5, 0, 6, 0, 0],
)
