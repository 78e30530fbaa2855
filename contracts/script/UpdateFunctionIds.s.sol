// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

import {VectorX} from "../src/VectorX.sol";

/// @notice Guardian op: point an existing VectorX deployment at new
///         verifier function ids (after re-registering circuits at a new
///         size or a prover upgrade). Parity with the reference's
///         contracts/script/UpdateFunctionIds.s.sol role.
///
///   CONTRACT_ADDRESS, HEADER_RANGE_FUNCTION_ID, ROTATE_FUNCTION_ID,
///   HEADER_RANGE_COMMITMENT_TREE_SIZE
///
/// Run: forge script script/UpdateFunctionIds.s.sol --rpc-url $RPC --broadcast
interface IVm {
    function envAddress(string calldata) external view returns (address);
    function envUint(string calldata) external view returns (uint256);
    function envBytes32(string calldata) external view returns (bytes32);
    function startBroadcast() external;
    function stopBroadcast() external;
}

contract UpdateFunctionIds {
    IVm constant vm = IVm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external {
        VectorX vectorx = VectorX(vm.envAddress("CONTRACT_ADDRESS"));
        vm.startBroadcast();
        vectorx.updateFunctionIds(
            vm.envBytes32("HEADER_RANGE_FUNCTION_ID"),
            vm.envBytes32("ROTATE_FUNCTION_ID"),
            uint32(vm.envUint("HEADER_RANGE_COMMITMENT_TREE_SIZE"))
        );
        vm.stopBroadcast();
    }
}
