// Approximator self-test for the reference-baseline harness: replicates
// the reference's own "test" mode (ik_test.cpp) — compare
// computeApproximateMutations against exact FK under small random
// perturbations.  Validates the stub headers preserve the reference's
// mutation-approximator semantics.
#include <cstdio>
#include <cstdlib>
#include <random>

#include "ik_base.h"

using namespace bio_ik;

int main(int argc, char** argv)
{
    if(argc < 3)
    {
        fprintf(stderr, "usage: %s spec tip\n", argv[0]);
        return 2;
    }
    auto model = moveit::core::RobotModel::loadSpec(argv[1]);
    moveit::core::RobotModelConstPtr model_c = model;
    auto* tip_link = model->getLinkModel(argv[2]);
    if(!tip_link) return 2;

    RobotFK fk(model_c);
    fk.initialize({(size_t)tip_link->getLinkIndex()});
    RobotFK_Fast fk_exact(model_c);
    fk_exact.initialize({(size_t)tip_link->getLinkIndex()});

    size_t nvars = model->getVariableCount();
    std::vector<size_t> active;
    for(size_t i = 0; i < nvars; i++)
        active.push_back(i);

    std::mt19937 rng(1);
    std::uniform_real_distribution<double> u(-1.0, 1.0);
    double max_err = 0.0;
    for(int trial = 0; trial < 32; trial++)
    {
        std::vector<double> q0(nvars);
        for(auto& v : q0)
            v = u(rng);
        fk.applyConfiguration(q0);
        fk.initializeMutationApproximator(active);

        // one mutation: q0 + 0.01-rad perturbations
        std::vector<aligned_vector<double>> mutated(1);
        mutated[0].resize(nvars);
        std::vector<double> qm(nvars);
        for(size_t i = 0; i < nvars; i++)
        {
            mutated[0][i] = q0[i] + 0.01 * u(rng);
            qm[i] = mutated[0][i];
        }
        std::vector<const double*> inputs{mutated[0].data()};
        std::vector<aligned_vector<Frame>> approx;
        fk.computeApproximateMutations(1, inputs.data(), approx);

        fk_exact.applyConfiguration(qm);
        auto& exact = fk_exact.getTipFrames()[0];
        double e = (approx[0][0].pos - exact.pos).length();
        if(e > max_err) max_err = e;
    }
    printf("{\"approx_vs_exact_max_pos_err_m\": %.3e}\n", max_err);
    return max_err < 1e-3 ? 0 : 1;
}
