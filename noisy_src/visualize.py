from robust_nerf_tpu.utils.visualize import (  # noqa: F401
    compare_experiments,
    create_summary_table,
    main,
    plot_final_results,
    plot_pose_errors,
    plot_training_curves,
    plot_validation_curves,
)

if __name__ == "__main__":
    main()
