// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

import {VectorX} from "../src/VectorX.sol";

/// @notice Foundry deploy script. Environment variables mirror the genesis
///         tool output (vectorx_tpu/services/entrypoint.py `genesis` verb,
///         parity with the reference's bin/genesis.rs + Deploy.s.sol):
///
///   GUARDIAN_ADDRESS, GATEWAY_ADDRESS,
///   GENESIS_HEIGHT, GENESIS_HEADER,
///   GENESIS_AUTHORITY_SET_ID, GENESIS_AUTHORITY_SET_HASH,
///   HEADER_RANGE_FUNCTION_ID, ROTATE_FUNCTION_ID,
///   HEADER_RANGE_COMMITMENT_TREE_SIZE
///
/// Run: forge script script/Deploy.s.sol --rpc-url $RPC --broadcast
interface IVm {
    function envAddress(string calldata) external view returns (address);
    function envUint(string calldata) external view returns (uint256);
    function envBytes32(string calldata) external view returns (bytes32);
    function startBroadcast() external;
    function stopBroadcast() external;
}

contract Deploy {
    IVm constant vm = IVm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external returns (address) {
        VectorX.InitParameters memory p = VectorX.InitParameters({
            guardian: vm.envAddress("GUARDIAN_ADDRESS"),
            gateway: vm.envAddress("GATEWAY_ADDRESS"),
            height: uint32(vm.envUint("GENESIS_HEIGHT")),
            header: vm.envBytes32("GENESIS_HEADER"),
            authoritySetId: uint64(vm.envUint("GENESIS_AUTHORITY_SET_ID")),
            authoritySetHash: vm.envBytes32("GENESIS_AUTHORITY_SET_HASH"),
            headerRangeFunctionId: vm.envBytes32("HEADER_RANGE_FUNCTION_ID"),
            rotateFunctionId: vm.envBytes32("ROTATE_FUNCTION_ID"),
            headerRangeCommitmentTreeSize: uint32(
                vm.envUint("HEADER_RANGE_COMMITMENT_TREE_SIZE")
            )
        });

        vm.startBroadcast();
        VectorX vectorx = new VectorX(p);
        vm.stopBroadcast();
        return address(vectorx);
    }
}
