from det3d_tpu.visualization.simplevis import (bev_canvas, draw_boxes_bev,
                                               draw_points_bev, kitti_vis,
                                               nuscene_vis)

__all__ = ["bev_canvas", "draw_points_bev", "draw_boxes_bev", "kitti_vis",
           "nuscene_vis"]
