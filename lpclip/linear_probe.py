"""Few-shot linear probe on dumped CLIP features.

Port of the reference ``lpclip/linear_probe.py:27-129``: per shot count
{1,2,4,8,16}, sample a few-shot train/val subset per seed, 7-point
logarithmic C grid search for sklearn LogisticRegression, then an 8-step
binary search refining C, reporting mean test accuracy across runs.

Usage:
  python lpclip/linear_probe.py --dataset EuroSAT --feature_dir ./lpclip_feats
"""

import argparse
import os

import numpy as np
from sklearn.linear_model import LogisticRegression

VAL_SHOT = {1: 1, 2: 2, 4: 4, 8: 4, 16: 4}


def fit_acc(c, xtr, ytr, xval, yval):
    clf = LogisticRegression(
        solver="lbfgs", max_iter=1000, penalty="l2", C=c
    ).fit(xtr, ytr)
    return clf, (clf.predict(xval) == yval).mean()


def main(args):
    dataset_path = os.path.join(args.feature_dir, args.dataset)
    train = np.load(os.path.join(dataset_path, "train.npz"))
    val = np.load(os.path.join(dataset_path, "val.npz"))
    test = np.load(os.path.join(dataset_path, "test.npz"))
    xtr_all, ytr_all = train["feature_list"], train["label_list"]
    xval_all, yval_all = val["feature_list"], val["label_list"]
    xte, yte = test["feature_list"], test["label_list"]

    os.makedirs("report", exist_ok=True)
    report_lines = []
    for num_shot in args.shots:
        accs = np.zeros([args.num_run, args.num_step])
        for seed in range(1, args.num_run + 1):
            np.random.seed(seed)
            labels = np.unique(ytr_all)

            def sample(x, y, k):
                idx = []
                for label in labels:
                    pool = np.where(y == label)[0]
                    idx.extend(
                        np.random.choice(pool, size=min(k, len(pool)), replace=False)
                    )
                return x[idx], y[idx]

            xtr, ytr = sample(xtr_all, ytr_all, num_shot)
            xval, yval = sample(xval_all, yval_all, VAL_SHOT.get(num_shot, 4))

            # coarse grid
            grid = [1e6, 1e4, 1e2, 1, 1e-2, 1e-4, 1e-6]
            grid_acc = [fit_acc(c, xtr, ytr, xval, yval)[1] for c in grid]
            c_peak = grid[int(np.argmax(grid_acc))]
            c_left, c_right = 1e-1 * c_peak, 1e1 * c_peak

            for step in range(args.num_step):
                clf_l, acc_l = fit_acc(c_left, xtr, ytr, xval, yval)
                clf_r, acc_r = fit_acc(c_right, xtr, ytr, xval, yval)
                if acc_l < acc_r:
                    c_final, clf_final = c_right, clf_r
                    c_left = 10 ** (0.5 * (np.log10(c_right) + np.log10(c_left)))
                else:
                    c_final, clf_final = c_left, clf_l
                    c_right = 10 ** (0.5 * (np.log10(c_right) + np.log10(c_left)))
                test_acc = 100.0 * (clf_final.predict(xte) == yte).mean()
                accs[seed - 1, step] = test_acc
                print(
                    f"{args.dataset}, seed {seed}, {num_shot} shot, "
                    f"C {c_final:g}, test_acc {test_acc:.2f}",
                    flush=True,
                )
        final = accs[:, -1]
        line = (
            f"{args.dataset}, {num_shot} shot: "
            f"{final.mean():.2f} +- {final.std():.2f}"
        )
        print(line)
        report_lines.append(line)

    with open(os.path.join("report", f"{args.dataset}.txt"), "w") as f:
        f.write("\n".join(report_lines) + "\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--feature_dir", default="./lpclip_feats")
    parser.add_argument("--num_run", type=int, default=10)
    parser.add_argument("--num_step", type=int, default=8)
    parser.add_argument("--shots", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    main(parser.parse_args())
