// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

import {VectorX} from "../src/VectorX.sol";

/// @notice Deploy a VectorX instance wired to a custom (self-hosted)
///         proof gateway — the "run your own prover" path, parity with the
///         reference's contracts/script/DeployCustomProver.s.sol role.
///         Identical to Deploy.s.sol except the gateway address points at
///         the operator's own IProofGateway implementation and the
///         function ids are derived locally:
///         keccak256("vectorx_tpu/<program>/<tree_size>").
///
///   GUARDIAN_ADDRESS, CUSTOM_GATEWAY_ADDRESS,
///   GENESIS_HEIGHT, GENESIS_HEADER,
///   GENESIS_AUTHORITY_SET_ID, GENESIS_AUTHORITY_SET_HASH,
///   HEADER_RANGE_COMMITMENT_TREE_SIZE
interface IVm {
    function envAddress(string calldata) external view returns (address);
    function envUint(string calldata) external view returns (uint256);
    function envBytes32(string calldata) external view returns (bytes32);
    function startBroadcast() external;
    function stopBroadcast() external;
}

contract DeployCustomProver {
    IVm constant vm = IVm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external returns (address) {
        uint32 treeSize =
            uint32(vm.envUint("HEADER_RANGE_COMMITMENT_TREE_SIZE"));
        VectorX.InitParameters memory p = VectorX.InitParameters({
            guardian: vm.envAddress("GUARDIAN_ADDRESS"),
            gateway: vm.envAddress("CUSTOM_GATEWAY_ADDRESS"),
            height: uint32(vm.envUint("GENESIS_HEIGHT")),
            header: vm.envBytes32("GENESIS_HEADER"),
            authoritySetId: uint64(vm.envUint("GENESIS_AUTHORITY_SET_ID")),
            authoritySetHash: vm.envBytes32("GENESIS_AUTHORITY_SET_HASH"),
            headerRangeFunctionId: keccak256(
                abi.encodePacked("vectorx_tpu/header_range/", treeSize)
            ),
            rotateFunctionId: keccak256("vectorx_tpu/rotate"),
            headerRangeCommitmentTreeSize: treeSize
        });

        vm.startBroadcast();
        VectorX vectorx = new VectorX(p);
        vm.stopBroadcast();
        return address(vectorx);
    }
}
