from robust_nerf_tpu.utils.visualize import (  # noqa: F401
    check_dependencies,
    compare_experiments,
    create_report_figures,
    create_summary_table,
    load_summary,
    load_training_logs,
    load_validation_logs,
    main,
    plot_final_results,
    plot_pose_errors,
    plot_training_curves,
    plot_validation_curves,
)

if __name__ == "__main__":
    main()
