"""Preprocessing suite vs sklearn oracle (tier 1, mirrors the reference's
sklearn-derived golden tests, feature/preprocessing/data_test.go)."""
import numpy as np
import pytest
import sklearn.preprocessing as skp
import sklearn.decomposition as skd
import sklearn.impute as ski

from goctr_tpu.features.preprocessing import (
    Binarizer, FunctionTransformer, Imputer, IncrementalMeanVar,
    KBinsDiscretizer, KernelCenterer, LabelBinarizer, LabelEncoder,
    MaxAbsScaler, MinMaxScaler, MultiLabelBinarizer, Normalizer, OneHotEncoder,
    PCA, PolynomialFeatures, PowerTransformer, QuantileTransformer,
    RobustScaler, Shuffler, StandardScaler,
)


@pytest.fixture
def X(rng):
    return (rng.random((60, 4)) * 10 - 3).astype(np.float64)


def test_minmax(X):
    ours = MinMaxScaler().fit_transform(X)
    theirs = skp.MinMaxScaler().fit_transform(X)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)
    s = MinMaxScaler((-1, 2)).fit(X)
    np.testing.assert_allclose(s.inverse_transform(s.transform(X)), X,
                               atol=1e-10)


def test_standard(X):
    np.testing.assert_allclose(StandardScaler().fit_transform(X),
                               skp.StandardScaler().fit_transform(X),
                               atol=1e-10)


def test_standard_partial_fit(X):
    s = StandardScaler()
    s.partial_fit(X[:20]); s.partial_fit(X[20:45]); s.partial_fit(X[45:])
    full = StandardScaler().fit(X)
    np.testing.assert_allclose(s.mean_, full.mean_, atol=1e-9)
    np.testing.assert_allclose(s.var_, full.var_, atol=1e-9)


def test_robust(X):
    np.testing.assert_allclose(RobustScaler().fit_transform(X),
                               skp.RobustScaler().fit_transform(X),
                               atol=1e-10)


def test_maxabs(X):
    np.testing.assert_allclose(MaxAbsScaler().fit_transform(X),
                               skp.MaxAbsScaler().fit_transform(X),
                               atol=1e-12)


@pytest.mark.parametrize("norm", ["l1", "l2", "max"])
def test_normalizer(X, norm):
    np.testing.assert_allclose(
        Normalizer(norm).fit_transform(X),
        skp.Normalizer(norm).fit_transform(X), atol=1e-12)


def test_binarizer(X):
    np.testing.assert_allclose(
        Binarizer(1.0).fit_transform(X),
        skp.Binarizer(threshold=1.0).fit_transform(X), atol=0)


def test_polynomial(X):
    for io in (False, True):
        ours = PolynomialFeatures(2, interaction_only=io).fit_transform(X)
        theirs = skp.PolynomialFeatures(2, interaction_only=io
                                        ).fit_transform(X)
        np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_quantile_uniform(X):
    q = QuantileTransformer(n_quantiles=50)
    ours = q.fit_transform(X)
    theirs = skp.QuantileTransformer(n_quantiles=50).fit_transform(X)
    np.testing.assert_allclose(ours, theirs, atol=0.05)
    inv = q.inverse_transform(ours)
    np.testing.assert_allclose(inv, X, atol=0.3)


def test_power_yeo_johnson(X):
    p = PowerTransformer().fit(X)
    sk = skp.PowerTransformer().fit(X)
    np.testing.assert_allclose(p.lambdas_, sk.lambdas_, atol=0.05)
    np.testing.assert_allclose(p.transform(X), sk.transform(X), atol=0.05)


def test_power_box_cox(rng):
    Xp = rng.random((80, 3)) * 5 + 0.1
    p = PowerTransformer(method="box-cox").fit(Xp)
    sk = skp.PowerTransformer(method="box-cox").fit(Xp)
    np.testing.assert_allclose(p.lambdas_, sk.lambdas_, atol=0.05)
    with pytest.raises(ValueError):
        PowerTransformer(method="box-cox").fit(np.array([[-1.0], [2.0]]))


def test_kernel_centerer(rng):
    A = rng.random((20, 6))
    K = A @ A.T
    np.testing.assert_allclose(KernelCenterer().fit_transform(K),
                               skp.KernelCenterer().fit_transform(K),
                               atol=1e-10)


def test_incremental_mean_var(rng):
    x = rng.random((100, 3))
    inc = IncrementalMeanVar(3)
    for chunk in np.array_split(x, 7):
        inc.update(chunk)
    np.testing.assert_allclose(inc.mean, x.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(inc.var, x.var(axis=0), atol=1e-10)


def test_shuffler(rng):
    X = rng.random((30, 2)); Y = np.arange(30)
    Xs, Ys = Shuffler(1).fit_transform(X, Y)
    assert not np.array_equal(Ys, Y)
    np.testing.assert_allclose(Xs, X[Ys])   # alignment preserved


def test_label_encoder():
    y = ["b", "a", "c", "a"]
    le = LabelEncoder().fit(y)
    np.testing.assert_array_equal(le.transform(y), [1, 0, 2, 0])
    assert list(le.inverse_transform([2, 1])) == ["c", "b"]
    with pytest.raises(ValueError):
        le.transform(["zz"])


def test_label_binarizer_binary_and_multi():
    lb = LabelBinarizer().fit([0, 1, 1, 0])
    out = lb.transform([1, 0])
    np.testing.assert_array_equal(out, [[1.0], [0.0]])
    np.testing.assert_array_equal(lb.inverse_transform(out), [1, 0])
    lb3 = LabelBinarizer().fit([0, 1, 2])
    np.testing.assert_array_equal(
        lb3.transform([2, 0]), [[0, 0, 1], [1, 0, 0]])


def test_multilabel_binarizer():
    y = [("a", "b"), ("b",), ()]
    mlb = MultiLabelBinarizer()
    out = mlb.fit_transform(y)
    np.testing.assert_array_equal(out, [[1, 1], [0, 1], [0, 0]])
    assert mlb.inverse_transform(out) == [("a", "b"), ("b",), ()]


def test_onehot_matrix():
    X = np.array([["a", "x"], ["b", "x"], ["a", "y"]])
    enc = OneHotEncoder().fit(X)
    out = enc.transform(X)
    np.testing.assert_array_equal(out, [[1, 0, 1, 0], [0, 1, 1, 0],
                                        [1, 0, 0, 1]])
    np.testing.assert_array_equal(enc.inverse_transform(out), X)


def test_kbins(X):
    ours = KBinsDiscretizer(4).fit_transform(X)
    theirs = skp.KBinsDiscretizer(
        n_bins=4, encode="ordinal", strategy="quantile",
        quantile_method="linear").fit_transform(X)
    assert np.mean(ours == theirs) > 0.95   # edge ties may differ


def test_pca(X):
    ours = PCA(2).fit(X)
    theirs = skd.PCA(2).fit(X)
    np.testing.assert_allclose(ours.explained_variance_,
                               theirs.explained_variance_, rtol=1e-8)
    # components up to sign
    for k in range(2):
        dot = abs(np.dot(ours.components_[k], theirs.components_[k]))
        assert dot == pytest.approx(1.0, abs=1e-8)
    rec = ours.inverse_transform(ours.transform(X))
    sk_rec = theirs.inverse_transform(theirs.transform(X))
    np.testing.assert_allclose(rec, sk_rec, atol=1e-8)


def test_imputer():
    X = np.array([[1.0, np.nan], [3.0, 4.0], [np.nan, 6.0]])
    ours = Imputer("mean").fit_transform(X)
    theirs = ski.SimpleImputer(strategy="mean").fit_transform(X)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)
    med = Imputer("median").fit(X)
    np.testing.assert_allclose(med.statistics_, [2.0, 5.0])


def test_function_transformer(X):
    ft = FunctionTransformer(np.log1p, np.expm1)
    out = ft.fit_transform(np.abs(X))
    np.testing.assert_allclose(ft.inverse_transform(out), np.abs(X),
                               atol=1e-10)
