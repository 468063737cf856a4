"""Data layer: scene readers for the KITTI/Waymo/nuScenes npz+PLY contracts,
camera/prior loading, and PLY IO (no external plyfile/open3d dependencies)."""
