// bio_ik reference-baseline driver (part of the bio_ik_tpu harness).
//
// Compiles the REFERENCE solver sources (/root/reference/src, unmodified)
// against the ROS-free stub headers in ./stubs and runs the reference's
// own solve loop on a fixed target set, emulating IKParallel's racing
// threads sequentially: each island gets its own wall-clock window of
// `timeout` seconds (the per-thread budget of ik_parallel.h:160-190) and
// the winner is selected exactly as in ik_parallel.h:220-261.  This
// produces reference-measured success rates / errors to anchor
// tools/parity_rates.py against.
//
// Usage: driver <robot.spec> <targets.txt> <mode> <timeout_s> <threads>
//               <dtwist> <tip_link>
// targets.txt: first line "seed v0 v1 ... v{n-1}" (full variable vector),
// then one line per target: "px py pz qx qy qz qw".

#include <cfloat>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>
#include <algorithm>

#include "ik_base.h"
#include <bio_ik/goal_types.h>

using namespace bio_ik;

static double now_s()
{
    using C = std::chrono::steady_clock;
    return std::chrono::duration<double>(C::now().time_since_epoch()).count();
}

int main(int argc, char** argv)
{
    if(argc < 8)
    {
        fprintf(stderr,
                "usage: %s spec targets mode timeout_s threads dtwist tip\n",
                argv[0]);
        return 2;
    }
    std::string spec = argv[1], targets_path = argv[2], mode = argv[3];
    double timeout_s = atof(argv[4]);
    int threads = atoi(argv[5]);
    double dtwist = atof(argv[6]);
    std::string tip = argv[7];

    auto model = moveit::core::RobotModel::loadSpec(spec);
    moveit::core::RobotModelConstPtr model_c = model;
    auto jmg = moveit::core::JointModelGroup::allActive(*model);

    IKParams params;
    params.robot_model = model_c;
    params.joint_model_group = &jmg;
    params.solver_class_name = mode;
    params.enable_counter = false;
    params.thread_count = threads;
    params.random_seed = 42;
    params.dpos = DBL_MAX;
    params.drot = DBL_MAX;
    params.dtwist = dtwist;
    params.opt_no_wipeout = false;
    params.population_size = 8;
    params.elite_count = 4;
    params.linear_fitness = false;

    // targets + seed
    std::ifstream tf(targets_path);
    if(!tf)
    {
        fprintf(stderr, "cannot open %s\n", targets_path.c_str());
        return 2;
    }
    std::string line;
    std::getline(tf, line);
    std::istringstream ss(line);
    std::string tag;
    ss >> tag; // "seed"
    std::vector<double> seed;
    for(double v; ss >> v;)
        seed.push_back(v);
    if(seed.size() != model->getVariableCount())
    {
        fprintf(stderr, "seed size %zu != nvars %zu\n", seed.size(),
                model->getVariableCount());
        return 2;
    }
    struct Target
    {
        tf2::Vector3 pos;
        tf2::Quaternion rot;
    };
    std::vector<Target> targets;
    while(std::getline(tf, line))
    {
        if(line.empty()) continue;
        std::istringstream ls(line);
        double px, py, pz, qx, qy, qz, qw;
        ls >> px >> py >> pz >> qx >> qy >> qz >> qw;
        targets.push_back(
            {tf2::Vector3(px, py, pz), tf2::Quaternion(qx, qy, qz, qw)});
    }

    if(mode == "fkcheck")
    {
        // FK cross-validation: each target line is a full variable vector;
        // print the reference FK's tip pose for each
        RobotFK fk(model_c);
        auto* tip_link = model->getLinkModel(tip);
        if(!tip_link)
        {
            fprintf(stderr, "unknown tip %s\n", tip.c_str());
            return 2;
        }
        fk.initialize({(size_t)tip_link->getLinkIndex()});
        std::ifstream tf2s(targets_path);
        std::getline(tf2s, line); // seed line (unused)
        while(std::getline(tf2s, line))
        {
            if(line.empty()) continue;
            std::istringstream ls(line);
            std::vector<double> q(model->getVariableCount(), 0.0);
            for(auto& v : q)
                ls >> v;
            fk.applyConfiguration(q);
            auto& f = fk.getTipFrames()[0];
            printf("%.17g %.17g %.17g %.17g %.17g %.17g %.17g\n", f.pos.x(),
                   f.pos.y(), f.pos.z(), f.rot.x(), f.rot.y(), f.rot.z(),
                   f.rot.w());
        }
        return 0;
    }

    // solver islands (reference: ik_parallel.h:110-139)
    std::vector<std::unique_ptr<IKSolver>> solvers;
    solvers.emplace_back(IKFactory::create(mode, params));
    size_t thread_count =
        threads > 0 ? (size_t)threads : solvers.front()->concurrency();
    while(solvers.size() < thread_count)
        solvers.emplace_back(IKFactory::clone(solvers.front().get()));
    for(size_t i = 0; i < thread_count; i++)
        solvers[i]->thread_index = i;

    PoseGoal goal;
    goal.setLinkName(tip);
    std::vector<const Goal*> goals{&goal};

    size_t n_success = 0;
    std::vector<double> pos_errs;
    double total_wall = 0.0;
    for(auto& tgt : targets)
    {
        goal.setPosition(tgt.pos);
        goal.setOrientation(tgt.rot);
        Problem problem;
        problem.timeout = 0.0; // the driver manages wall-clock itself
        problem.initial_guess = seed;
        problem.initialize(model_c, &jmg, params, goals, nullptr);

        std::vector<std::vector<double>> solutions(thread_count, seed);
        std::vector<int> succ(thread_count, 0);
        std::vector<double> fit(thread_count, DBL_MAX);
        size_t steps_run = 0;

        double t0 = now_s();
        for(size_t i = 0; i < thread_count; i++)
        {
            solvers[i]->canceled = false; // as IKParallel::solve resets it
            solvers[i]->initialize(problem);
            double deadline = now_s() + timeout_s;
            // replicate solverthread (ik_parallel.h:160-190); each island
            // runs its full window (a parallel thread would have had the
            // same per-thread budget)
            bool island_done = false;
            for(size_t iteration = 0;
                (now_s() < deadline && !island_done) ||
                (iteration == 0 && i == 0);
                iteration++)
            {
                solvers[i]->step();
                steps_run++;
                for(int it2 = 1; it2 < 4; it2++)
                    if(now_s() < deadline)
                    {
                        solvers[i]->step();
                        steps_run++;
                    }
                auto& result = solvers[i]->getSolution();
                auto& fk = solvers[i]->model;
                fk.applyConfiguration(result);
                bool s = solvers[i]->checkSolution(result, fk.getTipFrames());
                succ[i] = s;
                solutions[i] = result;
                fit[i] = solvers[i]->computeFitness(result, fk.getTipFrames());
                if(s) island_done = true;
            }
        }
        total_wall += now_s() - t0;
        if(getenv("REF_DEBUG"))
            fprintf(stderr, "target steps=%zu best_fit=%.3e succ0=%d\n",
                    steps_run, *std::min_element(fit.begin(), fit.end()),
                    succ[0]);

        // winner selection (ik_parallel.h:220-261; no secondary goals here)
        size_t best_index = 0;
        double best_fitness = DBL_MAX;
        for(size_t i = 0; i < thread_count; i++)
            if(succ[i] && fit[i] < best_fitness)
            {
                best_fitness = fit[i];
                best_index = i;
            }
        if(best_fitness == DBL_MAX)
            for(size_t i = 0; i < thread_count; i++)
                if(fit[i] < best_fitness)
                {
                    best_fitness = fit[i];
                    best_index = i;
                }

        if(succ[best_index]) n_success++;
        auto& fk = solvers[0]->model;
        fk.applyConfiguration(solutions[best_index]);
        double perr = (fk.getTipFrames()[0].pos - tgt.pos).length();
        pos_errs.push_back(perr);
    }

    std::sort(pos_errs.begin(), pos_errs.end());
    double med = pos_errs.empty() ? 0.0 : pos_errs[pos_errs.size() / 2];
    size_t sub_mm = 0;
    for(double e : pos_errs)
        if(e < 1e-3) sub_mm++;
    printf("{\"mode\": \"%s\", \"timeout_ms\": %.3f, \"threads\": %zu, "
           "\"n_targets\": %zu, \"success_rate\": %.4f, "
           "\"median_pos_err_m\": %.3e, \"frac_err<1mm\": %.4f, "
           "\"wall_s_total\": %.2f}\n",
           mode.c_str(), timeout_s * 1e3, thread_count, targets.size(),
           (double)n_success / targets.size(), med,
           (double)sub_mm / targets.size(), total_wall);
    return 0;
}
